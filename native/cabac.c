/* Native CABAC bin packer — the host-side serial hot loop in C.
 *
 * Role of the reference's entropy inner loop (VTM:EncoderLib/BinEncoder.cpp);
 * everything vectorisable (bin values, context indices) is produced array-wise
 * by vvctpu/cabac/binarize.py; only the arithmetic-coder state update runs
 * here.  Byte-identical to the Python engine (vvctpu/cabac/engine.py): the
 * emitted codeword is exactly the final interval lower edge over
 * (9 + renorm_count) bits, carries propagated into the emitted byte buffer.
 *
 * Built as libvvctpu_cabac.so (see native/Makefile), loaded via ctypes
 * (vvctpu/cabac/native.py); the Python engine is the documented fallback.
 */
#include <stdint.h>
#include <stddef.h>

typedef struct {
    uint8_t *buf;
    int64_t len;
    uint32_t low;     /* window: bottom `wbits` bits of the codeword */
    int wbits;
    uint32_t range;
    int64_t nbits;    /* renorm count */
} Enc;

static void carry_up(Enc *e)
{
    int64_t i = e->len;
    while (i > 0) {
        i--;
        if (e->buf[i] == 0xFF) {
            e->buf[i] = 0x00;
        } else {
            e->buf[i]++;
            return;
        }
    }
    /* carry past the leading 9-bit zero window is impossible: the codeword
     * value stays < 2^(9+nbits) because low < 2^9 * 2^nbits at all times */
}

static inline void add_low(Enc *e, uint32_t v)
{
    e->low += v;
    if (e->low >> e->wbits) {
        e->low &= (1u << e->wbits) - 1u;
        carry_up(e);
    }
}

static inline void flush_window(Enc *e)
{
    while (e->wbits >= 17) {
        int shift = e->wbits - 8;
        e->buf[e->len++] = (uint8_t)((e->low >> shift) & 0xFF);
        e->low &= (1u << shift) - 1u;
        e->wbits -= 8;
    }
}

static inline void renorm(Enc *e)
{
    while (e->range < 256) {
        e->range <<= 1;
        e->low <<= 1;
        e->wbits++;
        e->nbits++;
        flush_window(e);
    }
}

int64_t vvc_pack_bins(const int32_t *kinds, const int32_t *ctxs,
                      const int32_t *bins, int64_t n,
                      int32_t *p0, int32_t *p1,
                      const int32_t *sh0, const int32_t *sh1,
                      uint8_t *out, int64_t out_cap)
{
    Enc e = { out, 0, 0, 9, 510, 0 };
    for (int64_t i = 0; i < n; i++) {
        int32_t b = bins[i];
        int k = kinds[i];
        if (k == 0) {                      /* context bin */
            int32_t c = ctxs[i];
            int32_t p = (p0[c] << 4) + p1[c];
            int32_t mps = p >> 14;
            int32_t q = p < 16384 ? p : 32767 - p;
            uint32_t lps = (((e.range >> 5) * (uint32_t)(q >> 9)) >> 1) + 4;
            e.range -= lps;
            if (b != mps) {
                add_low(&e, e.range);
                e.range = lps;
            }
            p0[c] = p0[c] - (p0[c] >> sh0[c]) + ((1023 * b) >> sh0[c]);
            p1[c] = p1[c] - (p1[c] >> sh1[c]) + ((16383 * b) >> sh1[c]);
            renorm(&e);
        } else if (k == 1) {               /* bypass */
            e.low <<= 1;
            e.wbits++;
            e.nbits++;
            if (b)
                add_low(&e, e.range);
            flush_window(&e);
        } else {                           /* terminate */
            e.range -= 2;
            if (b) {
                add_low(&e, e.range);
                e.range = 2;
            }
            renorm(&e);
        }
        if (e.len + 16 > out_cap)
            return -1;
    }
    /* final flush: pad to a byte boundary, emit remaining window bits */
    {
        int64_t total = 9 + e.nbits;
        int pad = (int)((8 - (total & 7)) & 7);
        e.low <<= pad;
        e.wbits += pad;
        while (e.wbits >= 8) {
            int shift = e.wbits - 8;
            e.buf[e.len++] = (uint8_t)((e.low >> shift) & 0xFF);
            e.low &= (1u << shift) - 1u;
            e.wbits -= 8;
        }
    }
    return e.len;
}

/* ------------------------------------------------------------------ */
/* Decoder engine: sequential bin reads (structure bins via per-call,  */
/* residual TBs via the batch parser in a later revision).             */
/* ------------------------------------------------------------------ */

typedef struct {
    const uint8_t *buf;
    int64_t nbytes;
    int64_t pos;      /* bit position */
    uint32_t range;
    uint32_t offset;
} Dec;

static inline uint32_t read_bit(Dec *d)
{
    uint32_t b = 0;
    int64_t byte = d->pos >> 3;
    if (byte < d->nbytes)
        b = (d->buf[byte] >> (7 - (d->pos & 7))) & 1;
    d->pos++;
    return b;
}

void vvc_dec_init(Dec *d, const uint8_t *buf, int64_t nbytes)
{
    d->buf = buf;
    d->nbytes = nbytes;
    d->pos = 0;
    d->range = 510;
    d->offset = 0;
    for (int i = 0; i < 9; i++)
        d->offset = (d->offset << 1) | read_bit(d);
}

int32_t vvc_dec_bin(Dec *d, int32_t c, int32_t *p0, int32_t *p1,
                    const int32_t *sh0, const int32_t *sh1)
{
    int32_t p = (p0[c] << 4) + p1[c];
    int32_t mps = p >> 14;
    int32_t q = p < 16384 ? p : 32767 - p;
    uint32_t lps = (((d->range >> 5) * (uint32_t)(q >> 9)) >> 1) + 4;
    int32_t b;
    d->range -= lps;
    if (d->offset >= d->range) {
        b = 1 - mps;
        d->offset -= d->range;
        d->range = lps;
    } else {
        b = mps;
    }
    p0[c] = p0[c] - (p0[c] >> sh0[c]) + ((1023 * b) >> sh0[c]);
    p1[c] = p1[c] - (p1[c] >> sh1[c]) + ((16383 * b) >> sh1[c]);
    while (d->range < 256) {
        d->range <<= 1;
        d->offset = (d->offset << 1) | read_bit(d);
    }
    return b;
}

int32_t vvc_dec_bypass(Dec *d)
{
    d->offset = (d->offset << 1) | read_bit(d);
    if (d->offset >= d->range) {
        d->offset -= d->range;
        return 1;
    }
    return 0;
}

int32_t vvc_dec_bypass_bits(Dec *d, int32_t n)
{
    int32_t v = 0;
    for (int i = 0; i < n; i++)
        v = (v << 1) | vvc_dec_bypass(d);
    return v;
}

int32_t vvc_dec_terminate(Dec *d)
{
    int32_t b = 0;
    d->range -= 2;
    if (d->offset >= d->range) {
        d->range = 2;
        b = 1;
    }
    while (d->range < 256) {
        d->range <<= 1;
        d->offset = (d->offset << 1) | read_bit(d);
    }
    return b;
}

int64_t vvc_dec_sizeof(void) { return (int64_t)sizeof(Dec); }

/* WPP variant: identical packing, but copies the context state into
 * (snap_p0, snap_p1) after consuming `snap_idx` bins — the CABAC context
 * inheritance point (state after the first CTU of the row) that seeds the
 * next wavefront row's lane. */
int64_t vvc_pack_bins_snap(const int32_t *kinds, const int32_t *ctxs,
                           const int32_t *bins, int64_t n,
                           int32_t *p0, int32_t *p1,
                           const int32_t *sh0, const int32_t *sh1,
                           int64_t snap_idx, int32_t nctx,
                           int32_t *snap_p0, int32_t *snap_p1,
                           uint8_t *out, int64_t out_cap)
{
    Enc e = { out, 0, 0, 9, 510, 0 };
    for (int64_t i = 0; i < n; i++) {
        int32_t b = bins[i];
        int k = kinds[i];
        if (k == 0) {
            int32_t c = ctxs[i];
            int32_t p = (p0[c] << 4) + p1[c];
            int32_t mps = p >> 14;
            int32_t q = p < 16384 ? p : 32767 - p;
            uint32_t lps = (((e.range >> 5) * (uint32_t)(q >> 9)) >> 1) + 4;
            e.range -= lps;
            if (b != mps) {
                add_low(&e, e.range);
                e.range = lps;
            }
            p0[c] = p0[c] - (p0[c] >> sh0[c]) + ((1023 * b) >> sh0[c]);
            p1[c] = p1[c] - (p1[c] >> sh1[c]) + ((16383 * b) >> sh1[c]);
            renorm(&e);
        } else if (k == 1) {
            e.low <<= 1;
            e.wbits++;
            e.nbits++;
            if (b)
                add_low(&e, e.range);
            flush_window(&e);
        } else {
            e.range -= 2;
            if (b) {
                add_low(&e, e.range);
                e.range = 2;
            }
            renorm(&e);
        }
        if (i + 1 == snap_idx) {
            for (int32_t c = 0; c < nctx; c++) {
                snap_p0[c] = p0[c];
                snap_p1[c] = p1[c];
            }
        }
        if (e.len + 16 > out_cap)
            return -1;
    }
    {
        int64_t total = 9 + e.nbits;
        int pad = (int)((8 - (total & 7)) & 7);
        e.low <<= pad;
        e.wbits += pad;
        while (e.wbits >= 8) {
            int shift = e.wbits - 8;
            e.buf[e.len++] = (uint8_t)((e.low >> shift) & 0xFF);
            e.low &= (1u << shift) - 1u;
            e.wbits -= 8;
        }
    }
    return e.len;
}
