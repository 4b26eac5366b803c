"""Scale dress rehearsal: the full product ladder on a CrowdAI-shaped
synthetic dataset, with wall time and peak RSS recorded per leg.

Every quality claim through round 4 ran on ~40-image fixtures; CrowdAI is
~280k train / 60k val tiles (reference README.md dataset section), and
several paths hold whole samples in RAM. This driver generates >=5k
300x300 train tiles / >=1k val tiles at CrowdAI-like building density
(~8/tile via --max-buildings 20) with a proportionally heavy
annotation.json, then runs

    prepare_masks -> prepare_metadata -> train (short) ->
    evaluate -c 1000 -> evaluate (default) -> scoring train ->
    scoring evaluate -> export -> evaluate --artifact

each as its own subprocess whose peak RSS (ru_maxrss) is captured at exit,
writing `rehearsal_results.json` under --root and printing a per-leg table.

Usage (on the TPU host; first compiles are cached under
$JAX_COMPILATION_CACHE_DIR):

    python tools/scale_rehearsal.py --root /tmp/rehearsal \
        --n-train 5000 --n-val 1000

The reference's only scale knob was dev-mode sampling
(src/pipeline_manager.py:115-117); this records what the framework
actually does at product scale.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# runs mapping_tpu.main with argv, printing the child's own peak RSS on
# stderr at exit (no GNU time in this image; RUSAGE_CHILDREN maxrss is a
# cumulative max across legs, so each leg must self-report)
_WRAPPER = (
    "import atexit, resource, runpy, sys\n"
    "atexit.register(lambda: sys.stderr.write(\n"
    "    '\\nPEAK_RSS_KB %d\\n'\n"
    "    % resource.getrusage(resource.RUSAGE_SELF).ru_maxrss))\n"
    "sys.argv = ['mapping_tpu.main'] + {argv!r}\n"
    "runpy.run_module('mapping_tpu.main', run_name='__main__')\n"
)


def run_leg(name, argv, config_path, results, log_dir):
    env = dict(os.environ)
    env["CONFIG_PATH"] = config_path
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    log_path = os.path.join(log_dir, f"{name}.log")
    print(f"--- {name}: mapping_tpu.main {' '.join(argv)}", flush=True)
    t0 = time.monotonic()
    with open(log_path, "w") as log:
        proc = subprocess.run(
            [sys.executable, "-c", _WRAPPER.format(argv=argv)],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)
    wall = time.monotonic() - t0
    peak_kb = None
    with open(log_path) as f:
        for line in f:
            if line.startswith("PEAK_RSS_KB"):
                peak_kb = int(line.split()[1])
    entry = {
        "leg": name,
        "argv": argv,
        "wall_s": round(wall, 1),
        "peak_rss_mb": round(peak_kb / 1024.0, 1) if peak_kb else None,
        "returncode": proc.returncode,
        "log": log_path,
    }
    results.append(entry)
    print(f"    {wall:8.1f}s  peak {entry['peak_rss_mb']} MB  "
          f"rc={proc.returncode}", flush=True)
    if proc.returncode != 0:
        print(f"    FAILED — tail of {log_path}:", flush=True)
        with open(log_path) as f:
            print("".join(f.readlines()[-20:]), flush=True)
    return proc.returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=5000)
    ap.add_argument("--n-val", type=int, default=1000)
    ap.add_argument("--max-buildings", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--scoring-examples", type=int, default=2000)
    ap.add_argument("--encoder", default="ResNet34")
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument("--legs", default="",
                    help="comma-separated subset of leg names to run")
    args = ap.parse_args()

    root = os.path.abspath(args.root)
    data_dir = os.path.join(root, "data")
    os.makedirs(root, exist_ok=True)
    log_dir = os.path.join(root, "logs")
    os.makedirs(log_dir, exist_ok=True)

    if not args.skip_generate:
        sys.path.insert(0, REPO)
        from tests.fixtures.synthetic import generate

        print(f"generating {args.n_train} train / {args.n_val} val tiles "
              f"(max {args.max_buildings} buildings/tile)...", flush=True)
        t0 = time.monotonic()
        generate(data_dir, n_train=args.n_train, n_val=args.n_val, seed=7,
                 max_buildings=args.max_buildings)
        ann = os.path.getsize(os.path.join(data_dir, "train",
                                           "annotation.json"))
        print(f"generated in {time.monotonic() - t0:.0f}s; train "
              f"annotation.json = {ann / 1e6:.1f} MB", flush=True)

    params = {
        "data_dir": data_dir,
        "meta_dir": os.path.join(root, "meta"),
        "experiment_dir": os.path.join(root, "experiment"),
        "encoder": args.encoder,
        # production defaults where it matters for memory/throughput:
        # 256px inputs, batch 20, per-epoch COCO-AP validation on the
        # standard 1000-image sample
        "image_h": 256,
        "image_w": 256,
        "batch_size_train": 20,
        "batch_size_inference": 20,
        "epochs_nr": args.epochs,
        "patience": 100,
        "validate_with_map": 1,
        "evaluation_data_sample": 1000,
        "scoring_model__num_training_examples": args.scoring_examples,
        "lgbm__number_of_trees": 100,
    }
    config_path = os.path.join(root, "config.yaml")
    with open(config_path, "w") as f:
        json.dump({"parameters": params}, f, indent=1)  # yaml-parseable
    params19 = dict(params, category_layers=[1, 19])
    config19_path = os.path.join(root, "config19.yaml")
    with open(config19_path, "w") as f:
        json.dump({"parameters": params19}, f, indent=1)

    artifact_dir = os.path.join(root, "artifact")
    legs = [
        ("prepare_masks", ["prepare_masks"], config_path),
        ("prepare_metadata", ["prepare_metadata"], config_path),
        ("train", ["train", "-p", "unet_weighted"], config_path),
        ("evaluate_chunked", ["evaluate", "-p", "unet", "-c", "1000"],
         config_path),
        ("evaluate_default", ["evaluate", "-p", "unet"], config_path),
        ("scoring_train", ["train", "-p", "scoring_model"], config19_path),
        ("scoring_evaluate", ["evaluate", "-p", "unet_scoring_model"],
         config19_path),
        ("export", ["export", "-p", "unet", "--dir_path", artifact_dir],
         config_path),
        ("evaluate_artifact", ["evaluate", "--artifact", artifact_dir],
         config_path),
    ]
    only = {s.strip() for s in args.legs.split(",") if s.strip()}
    results = []
    results_path = os.path.join(root, "rehearsal_results.json")
    for name, argv, cfg in legs:
        if only and name not in only:
            continue
        ok = run_leg(name, argv, cfg, results, log_dir)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)
        if not ok:
            print("leg failed; stopping the ladder", flush=True)
            break

    print("\n=== rehearsal summary ===")
    print(f"{'leg':<20}{'wall_s':>10}{'peak_rss_mb':>14}  rc")
    for r in results:
        print(f"{r['leg']:<20}{r['wall_s']:>10}{str(r['peak_rss_mb']):>14}"
              f"  {r['returncode']}")
    print(f"results -> {results_path}")


if __name__ == "__main__":
    main()
