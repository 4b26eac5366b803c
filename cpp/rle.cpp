// COCO RLE kernels: counts<->string codec and run-space IoU.
//
// These re-implement (from the published wire-format spec) the hot loops the
// reference delegated to pycocotools' C `_mask` module
// (reference: src/utils.py:121-127, src/cocoeval.py:170-197). The IoU walks
// the two run lists directly — O(runs) instead of O(pixels) — which is what
// makes COCOeval over thousands of instances cheap on a 1-core host.

#include <cstdint>
#include <cstring>

extern "C" {

// Compress run counts into the COCO LEB128-style byte string.
// Returns the number of bytes written to `out` (caller sizes it generously).
long rle_counts_to_string(const long* cnts, long m, char* out) {
    long p = 0;
    for (long i = 0; i < m; i++) {
        long x = cnts[i];
        if (i > 2) x -= cnts[i - 2];
        bool more = true;
        while (more) {
            char c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            c += 48;
            out[p++] = c;
        }
    }
    return p;
}

// Decompress the byte string into run counts. Returns the run count.
long rle_string_to_counts(const char* s, long n, long* out) {
    long m = 0, p = 0;
    while (p < n) {
        long x = 0;
        int k = 0;
        bool more = true;
        while (more) {
            char c = s[p] - 48;
            x |= (long)(c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            p++;
            if (!more && (c & 0x10)) x |= -1L << (5 * (k + 1));
            k++;
        }
        if (m > 2) x += out[m - 2];
        out[m++] = x;
    }
    return m;
}

// IoU of two RLEs in run space (no mask materialization).
// iscrowd: union term is the detection area only (pycocotools semantics).
double rle_iou_single(const long* d, long nd, const long* g, long ng, int iscrowd) {
    // areas
    double da = 0, ga = 0;
    for (long i = 1; i < nd; i += 2) da += (double)d[i];
    for (long i = 1; i < ng; i += 2) ga += (double)g[i];
    if (da == 0 || ga == 0) return 0.0;

    // merge-walk the runs counting intersection of foreground intervals
    double inter = 0;
    long di = 0, gi = 0;
    long dpos = 0, gpos = 0;       // absolute start of current run
    long dend = (nd > 0) ? d[0] : 0;  // end of current run (exclusive)
    long gend = (ng > 0) ? g[0] : 0;
    bool dval = false, gval = false;  // current run foreground?
    while (di < nd && gi < ng) {
        if (dval && gval) {
            long lo = (dpos > gpos) ? dpos : gpos;
            long hi = (dend < gend) ? dend : gend;
            if (hi > lo) inter += (double)(hi - lo);
        }
        if (dend <= gend) {
            di++;
            dpos = dend;
            if (di < nd) dend += d[di];
            dval = !dval;
        } else {
            gi++;
            gpos = gend;
            if (gi < ng) gend += g[gi];
            gval = !gval;
        }
    }
    double u = iscrowd ? da : (da + ga - inter);
    if (u <= 0) return 0.0;
    return inter / u;
}

}  // extern "C"

extern "C" {

// Single-pass: labeled instance map -> per-instance compressed RLE strings.
//
// Replaces the reference's decompose + per-instance Fortran-order re-encode
// (src/utils.py:61-123): that path re-scans the full H*W map once per
// instance (O(N*H*W)); this walks the map once in Fortran order, closing and
// opening runs on label transitions, then LEB-compresses each instance's
// counts. Labels: (h*w) int32, row-major (C order), values 0..n_instances.
//
// Outputs:
//   out_buf      — concatenated compressed `counts` strings
//   out_offsets  — n_instances+1 offsets into out_buf (instance i's string
//                  is out_buf[out_offsets[i-1]:out_offsets[i]])
//   out_bbox     — n_instances * 4 doubles [x, y, w, h] per instance
// Returns bytes written, or -1 if out_cap is too small.
long rle_instances(const int32_t* labels, long h, long w, long n_instances,
                   char* out_buf, long out_cap, long* out_offsets,
                   double* out_bbox) {
    out_offsets[0] = 0;
    if (n_instances <= 0) return 0;

    // Per-instance uncompressed counts (always starting with a bg run).
    struct Inst { long* counts; long m; long cap; long last_end; };
    Inst* inst = new Inst[n_instances];
    for (long i = 0; i < n_instances; i++)
        inst[i] = Inst{nullptr, 0, 0, 0};
    auto push = [](Inst& s, long v) {
        if (s.m == s.cap) {
            long nc = s.cap ? s.cap * 2 : 16;
            long* nb = new long[nc];
            if (s.counts) { memcpy(nb, s.counts, s.m * sizeof(long)); delete[] s.counts; }
            s.counts = nb; s.cap = nc;
        }
        s.counts[s.m++] = v;
    };

    // Walk in Fortran order; on each label transition close the run
    // [run_start, p) belonging to `prev`: its bg gap is run_start -
    // last_end (absolute prefix when last_end == 0), then the fg length.
    long total = h * w;
    long prev = 0, run_start = 0;
    for (long p = 0; p <= total; p++) {
        long v = 0;
        if (p < total) {
            long x = p / h, y = p % h;
            v = labels[y * w + x];
            if (v == prev) continue;
        }
        if (prev > 0 && prev <= n_instances) {
            Inst& s = inst[prev - 1];
            push(s, run_start - s.last_end);
            push(s, p - run_start);
            s.last_end = p;
        }
        run_start = p;
        prev = v;
    }

    long pos_bytes = 0;
    for (long i = 0; i < n_instances; i++) {
        Inst& s = inst[i];
        push(s, total - s.last_end);  // trailing bg so counts sum to h*w
        // exact bbox from the run list (a fg run spanning a column boundary
        // covers full rows, matching pycocotools toBbox)
        long xmin = w, xmax = -1, ymin = h, ymax = -1, acc = 0;
        for (long k = 0; k < s.m; k++) {
            long start = acc, end = acc + s.counts[k];
            if (k % 2 == 1 && end > start) {
                long x0 = start / h, y0 = start % h;
                long x1 = (end - 1) / h, y1 = (end - 1) % h;
                if (x0 < xmin) xmin = x0;
                if (x1 > xmax) xmax = x1;
                if (x1 > x0) { ymin = 0; ymax = h - 1; }
                else {
                    if (y0 < ymin) ymin = y0;
                    if (y1 > ymax) ymax = y1;
                }
            }
            acc = end;
        }
        if (xmax < 0) { xmin = 0; ymin = 0; xmax = -1; ymax = -1; }
        out_bbox[i * 4 + 0] = (double)xmin;
        out_bbox[i * 4 + 1] = (double)ymin;
        out_bbox[i * 4 + 2] = (double)(xmax - xmin + 1);
        out_bbox[i * 4 + 3] = (double)(ymax - ymin + 1);

        if (pos_bytes + s.m * 12 + 16 > out_cap) {
            for (long j = 0; j < n_instances; j++) delete[] inst[j].counts;
            delete[] inst;
            return -1;
        }
        pos_bytes += rle_counts_to_string(s.counts, s.m, out_buf + pos_bytes);
        out_offsets[i + 1] = pos_bytes;
    }
    for (long j = 0; j < n_instances; j++) delete[] inst[j].counts;
    delete[] inst;
    return pos_bytes;
}

}  // extern "C"
