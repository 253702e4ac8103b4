/* COCO run-length encoder, native host path.
 *
 * Role: the reference leans on pycocotools' C mask module for RLE
 * (GD/main_sam_hbox_semantic.py:201); at fleet scale (105k images x ~30
 * masks x ~1 MPix) the pure-Python varint loop dominates host time, so this
 * mirrors samrs_tpu/data/rle.py exactly in C.  Called via ctypes; releases
 * the GIL implicitly (plain C call), so Python thread pools parallelize it
 * across cores.
 *
 * Format: column-major runs starting with a zero-run; counts delta-encoded
 * (i>2: c[i]-=c[i-2]) then 5-bit varint chars offset by 48 (the pycocotools
 * byte format).
 */

#include <stdint.h>
#include <stddef.h>

/* Encode one H x W row-major uint8 binary mask.
 * out must hold >= ~(h*w/2)*8 bytes worst case; returns bytes written,
 * or -1 if out_cap would overflow. */
long rle_encode_mask(const uint8_t *mask, long h, long w, uint8_t *out, long out_cap) {
    long n = h * w;
    long out_len = 0;
    /* iterate in column-major (Fortran) order, building counts on the fly
     * with streaming delta + varint emission (prev2/prev1 hold raw counts) */
    long prev2 = 0, prev1 = 0;
    long count_idx = 0;
    uint8_t cur = 0; /* runs start with value 0 */
    long run = 0;

    /* emit one raw count with delta-varint coding */
    #define EMIT(xraw)                                                        \
        do {                                                                  \
            long x = (xraw);                                                  \
            if (count_idx > 2) x -= prev2;                                    \
            prev2 = prev1;                                                    \
            prev1 = (xraw);                                                   \
            count_idx++;                                                      \
            int more = 1;                                                     \
            while (more) {                                                    \
                long c = x & 0x1f;                                            \
                x >>= 5;                                                      \
                more = (c & 0x10) ? (x != -1) : (x != 0);                     \
                if (more) c |= 0x20;                                          \
                if (out_len >= out_cap) return -1;                            \
                out[out_len++] = (uint8_t)(c + 48);                           \
            }                                                                 \
        } while (0)

    for (long col = 0; col < w; col++) {
        const uint8_t *colp = mask + col;
        for (long row = 0; row < h; row++) {
            uint8_t v = colp[(size_t)row * w] ? 1 : 0;
            if (v == cur) {
                run++;
            } else {
                EMIT(run);
                cur = v;
                run = 1;
            }
        }
    }
    EMIT(run);
    (void)n;
    return out_len;
    #undef EMIT
}

/* Batched variant: masks (N, H, W) contiguous; offsets[i] receives the byte
 * offset of mask i's encoding in out; lengths[i] its length. Returns total
 * bytes or -1 on overflow. */
long rle_encode_batch(const uint8_t *masks, long n_masks, long h, long w,
                      uint8_t *out, long out_cap, long *offsets, long *lengths) {
    long total = 0;
    for (long i = 0; i < n_masks; i++) {
        long len = rle_encode_mask(masks + (size_t)i * h * w, h, w,
                                   out + total, out_cap - total);
        if (len < 0) return -1;
        offsets[i] = total;
        lengths[i] = len;
        total += len;
    }
    return total;
}
