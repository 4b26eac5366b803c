"""Host-side utilities (logging, seeding, chunking, native bindings)."""
