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
