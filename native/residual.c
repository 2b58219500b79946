/* Residual-coding hot loop in C: TB binarisation (encode) and TB parse
 * (decode), mirroring vvctpu/spec/residual.py code_tb exactly (enforced by
 * tests/test_native_residual.py).  The coding-tree walker stays in Python;
 * per-coefficient work runs here.
 *
 * Context-set offsets arrive via the cfg array so the Python context
 * registry stays the single source of truth:
 *   cfg[0]=last_x_off cfg[1]=last_y_off cfg[2]=cg_off cfg[3]=sig_off
 *   cfg[4]=gt1_off cfg[5]=par_off cfg[6]=gt3_off
 *   cfg[7]=sig_chroma_base(12) cfg[8]=gtx_chroma_base(12)
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

#define CG 4

static const int MIN_IN_GROUP[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};
static const int GROUP_IDX[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6,
                                  7, 7, 7, 7, 8, 8, 8, 8, 8, 8, 8, 8,
                                  9, 9, 9, 9, 9, 9, 9, 9};

typedef struct {
    int32_t *kinds, *ctxs, *bins;
    int64_t n;
} Sink;

static inline void put(Sink *s, int k, int c, int b)
{
    s->kinds[s->n] = k;
    s->ctxs[s->n] = c;
    s->bins[s->n] = b;
    s->n++;
}

static inline void put_byp_bits(Sink *s, int v, int n)
{
    for (int i = n - 1; i >= 0; i--)
        put(s, 1, 0, (v >> i) & 1);
}

static int last_ctx(int is_chroma, int log2s, int bin_idx, int base,
                    int set_size)
{
    int offset, shift;
    if (is_chroma) {
        offset = 15;
        shift = log2s - 2 > 0 ? log2s - 2 : 0;
    } else {
        offset = 3 * (log2s - 2) + ((log2s - 1) >> 2);
        shift = (log2s + 1) >> 2;
    }
    int inc = offset + (bin_idx >> shift);
    if (inc > set_size - 1)
        inc = set_size - 1;
    return base + inc;
}

static int rice_param(int local_sum)
{
    int bl = 0;
    while ((1 << bl) <= local_sum)
        bl++;            /* bl = bit_length(local_sum) */
    int r = bl - 2;
    if (r < 0) r = 0;
    if (r > 3) r = 3;
    return r;
}

static void golomb_rice_enc(Sink *s, int val, int k)
{
    int prefix = val >> k;
    if (prefix < 6) {
        for (int i = 0; i < prefix; i++) put(s, 1, 0, 1);
        put(s, 1, 0, 0);
        if (k) put_byp_bits(s, val & ((1 << k) - 1), k);
        return;
    }
    for (int i = 0; i < 6; i++) put(s, 1, 0, 1);
    int sym = val - (6 << k);
    int count = k + 1;
    while (sym >= (1 << count)) {
        put(s, 1, 0, 1);
        sym -= 1 << count;
        count++;
    }
    put(s, 1, 0, 0);
    if (count) put_byp_bits(s, sym, count);
}

static int tmpl5_sum(const int32_t *buf, int x, int y, int w, int h, int cap)
{
    static const int dx[5] = {1, 2, 0, 0, 1};
    static const int dy[5] = {0, 0, 1, 2, 1};
    int s = 0;
    for (int i = 0; i < 5; i++) {
        int nx = x + dx[i], ny = y + dy[i];
        if (nx < w && ny < h) {
            int v = buf[ny * w + nx];
            if (cap && v > cap) v = cap;
            s += v;
        }
    }
    return s;
}

static int sig_ctx(const int32_t *abs_buf, int x, int y, int w, int h,
                   int is_chroma, int sig_off, int sig_chroma_base)
{
    int tmpl = tmpl5_sum(abs_buf, x, y, w, h, 2);
    int d = x + y;
    int base;
    if (is_chroma)
        base = sig_chroma_base + (d == 0 ? 4 : 0);
    else
        base = d == 0 ? 8 : (d < 3 ? 4 : 0);
    int v = (tmpl + 1) >> 1;
    if (v > 3) v = 3;
    return sig_off + base + v;
}

/* scan: (n, 2) int32 pairs (x, y) in scan order (shared from Python ROM) */
int64_t vvc_tb_bins(const int32_t *levels, int log2_w, int log2_h,
                    int is_chroma, const int32_t *scan, const int32_t *cfg,
                    int32_t *kinds, int32_t *ctxs, int32_t *bins,
                    int64_t cap, int32_t *work)
{
    Sink snk = {kinds, ctxs, bins, 0};
    int w = 1 << log2_w, h = 1 << log2_h;
    int n = w * h;
    int sw = w < CG ? w : CG, sh = h < CG ? h : CG;
    int cg_n = sw * sh;
    int num_cg = n / cg_n;
    int last_x_off = cfg[0], last_y_off = cfg[1], cg_off_base = cfg[2];
    int sig_off = cfg[3], gt1_off = cfg[4], par_off = cfg[5];
    int gt3_off = cfg[6], sig_cb = cfg[7], gtx_cb = cfg[8];
    int last_set_size = 20;
    (void)cap;

    int32_t *abs_buf = work;             /* w*h */
    int32_t *cg_flags = work + n;        /* num_cg */
    memset(abs_buf, 0, sizeof(int32_t) * n);
    memset(cg_flags, 0, sizeof(int32_t) * num_cg);

    int last_scan = -1;
    for (int k = 0; k < n; k++) {
        int x = scan[2 * k], y = scan[2 * k + 1];
        if (levels[y * w + x])
            last_scan = k;
    }
    int lx = scan[2 * last_scan], ly = scan[2 * last_scan + 1];

    /* last position: both prefixes, then both suffixes */
    {
        int vals[2] = {lx, ly};
        int log2s[2] = {log2_w, log2_h};
        int bases[2] = {last_x_off, last_y_off};
        int maxp[2] = {w - 1, h - 1};
        for (int i = 0; i < 2; i++) {
            int g = GROUP_IDX[vals[i]];
            int gmax = GROUP_IDX[maxp[i]];
            int nb = g + (g < gmax ? 1 : 0);
            for (int j = 0; j < nb; j++) {
                int b = (j == nb - 1 && g < gmax) ? 0 : 1;
                put(&snk, 0, last_ctx(is_chroma, log2s[i], j, bases[i],
                                      last_set_size), b);
            }
        }
        for (int i = 0; i < 2; i++) {
            int g = GROUP_IDX[vals[i]];
            if (g > 3)
                put_byp_bits(&snk, vals[i] - MIN_IN_GROUP[g], (g >> 1) - 1);
        }
    }

    int last_cg = last_scan / cg_n;
    int cg_ctx_off = is_chroma ? 2 : 0;
    int gtx_base_off = is_chroma ? gtx_cb : 0;

    for (int cg = last_cg; cg >= 0; cg--) {
        int first = cg * cg_n, lastc = cg * cg_n + cg_n - 1;
        int cgx = scan[2 * first] / CG, cgy = scan[2 * first + 1] / CG;
        if (cg != last_cg && cg != 0) {
            int have = 0;
            for (int k = first; k <= lastc; k++)
                if (levels[scan[2 * k + 1] * w + scan[2 * k]]) {
                    have = 1;
                    break;
                }
            /* right/below CG flags (already coded in reverse scan) */
            int right = 0, below = 0;
            for (int c2 = 0; c2 < num_cg; c2++) {
                int sx = scan[2 * (c2 * cg_n)] / CG;
                int sy = scan[2 * (c2 * cg_n) + 1] / CG;
                if (sx == cgx + 1 && sy == cgy) right = cg_flags[c2];
                if (sx == cgx && sy == cgy + 1) below = cg_flags[c2];
            }
            int inc = right + below;
            if (inc > 1) inc = 1;
            put(&snk, 0, cg_off_base + cg_ctx_off + inc, have);
            cg_flags[cg] = have;
            if (!have)
                continue;
        } else {
            cg_flags[cg] = 1;
        }

        int start = (cg == last_cg) ? last_scan : lastc;
        int gt3_list[16 * 16];
        int gt3_par[16 * 16];
        int n_gt3 = 0;
        int sig_list[16 * 16];
        int n_sig = 0;
        for (int k = start; k >= first; k--) {
            int x = scan[2 * k], y = scan[2 * k + 1];
            int a = levels[y * w + x];
            if (a < 0) a = -a;
            int sig;
            if (k == last_scan) {
                sig = 1;
            } else {
                sig = a != 0;
                put(&snk, 0, sig_ctx(abs_buf, x, y, w, h, is_chroma,
                                     sig_off, sig_cb), sig);
            }
            if (!sig)
                continue;
            sig_list[n_sig++] = k;
            int tsum = tmpl5_sum(abs_buf, x, y, w, h, 0);
            int tctx = (tsum + 1) >> 1;
            if (tctx > 3) tctx = 3;
            int d = x + y;
            int dpart = is_chroma ? (d == 0 ? 4 : 0)
                                  : (d == 0 ? 8 : (d < 3 ? 4 : 0));
            int tbase = gtx_base_off + dpart + tctx;
            int gt1 = a > 1;
            put(&snk, 0, gt1_off + tbase, gt1);
            int lvl = 1;
            if (gt1) {
                int par = (a - 2) & 1;
                put(&snk, 0, par_off + tbase, par);
                int gt3 = a > 3;
                put(&snk, 0, gt3_off + tbase, gt3);
                lvl = 2 + par;
                if (gt3) {
                    lvl += 2;
                    gt3_list[n_gt3] = k;
                    gt3_par[n_gt3] = par;
                    n_gt3++;
                }
            }
            abs_buf[y * w + x] = lvl;
        }
        for (int i = 0; i < n_gt3; i++) {
            int k = gt3_list[i];
            int x = scan[2 * k], y = scan[2 * k + 1];
            int rice = rice_param(tmpl5_sum(abs_buf, x, y, w, h, 0));
            int a = levels[y * w + x];
            if (a < 0) a = -a;
            int rem = (a - 4 - gt3_par[i]) >> 1;
            golomb_rice_enc(&snk, rem, rice);
            abs_buf[y * w + x] = 4 + gt3_par[i] + 2 * rem;
        }
        for (int i = 0; i < n_sig; i++) {
            int k = sig_list[i];
            int x = scan[2 * k], y = scan[2 * k + 1];
            put(&snk, 1, 0, levels[y * w + x] < 0);
        }
    }
    return snk.n;
}

/* ---------------- decode ---------------- */
typedef struct {
    const uint8_t *buf;
    int64_t nbytes;
    int64_t pos;
    uint32_t range;
    uint32_t offset;
} Dec;

int32_t vvc_dec_bin(Dec *d, int32_t c, int32_t *p0, int32_t *p1,
                    const int32_t *sh0, const int32_t *sh1);
int32_t vvc_dec_bypass(Dec *d);
int32_t vvc_dec_bypass_bits(Dec *d, int32_t n);

static int tu_dec(Dec *d, int cmax, int is_chroma, int log2s, int base,
                  int set_size, int32_t *p0, int32_t *p1,
                  const int32_t *sh0, const int32_t *sh1)
{
    int v = 0;
    while (v < cmax && vvc_dec_bin(d, last_ctx(is_chroma, log2s, v, base,
                                               set_size), p0, p1, sh0, sh1))
        v++;
    return v;
}

static int golomb_rice_dec(Dec *d, int k)
{
    int prefix = 0;
    while (prefix < 6 && vvc_dec_bypass(d))
        prefix++;
    if (prefix < 6)
        return (prefix << k) + (k ? vvc_dec_bypass_bits(d, k) : 0);
    int count = k + 1;
    int sym = 6 << k;
    while (vvc_dec_bypass(d)) {
        sym += 1 << count;
        count++;
    }
    return sym + (count ? vvc_dec_bypass_bits(d, count) : 0);
}

void vvc_tb_parse(Dec *d, int32_t *p0, int32_t *p1, const int32_t *sh0,
                  const int32_t *sh1, int log2_w, int log2_h, int is_chroma,
                  const int32_t *scan, const int32_t *cfg, int32_t *out,
                  int32_t *work)
{
    int w = 1 << log2_w, h = 1 << log2_h;
    int n = w * h;
    int sw = w < CG ? w : CG, shh = h < CG ? h : CG;
    int cg_n = sw * shh;
    int num_cg = n / cg_n;
    int last_x_off = cfg[0], last_y_off = cfg[1], cg_off_base = cfg[2];
    int sig_off = cfg[3], gt1_off = cfg[4], par_off = cfg[5];
    int gt3_off = cfg[6], sig_cb = cfg[7], gtx_cb = cfg[8];

    int32_t *abs_buf = work;
    int32_t *cg_flags = work + n;
    int32_t *sign_buf = work + n + num_cg;
    memset(abs_buf, 0, sizeof(int32_t) * n);
    memset(cg_flags, 0, sizeof(int32_t) * num_cg);
    memset(sign_buf, 0, sizeof(int32_t) * n);
    memset(out, 0, sizeof(int32_t) * n);

    int gx = tu_dec(d, GROUP_IDX[w - 1], is_chroma, log2_w, last_x_off, 20,
                    p0, p1, sh0, sh1);
    int gy = tu_dec(d, GROUP_IDX[h - 1], is_chroma, log2_h, last_y_off, 20,
                    p0, p1, sh0, sh1);
    int lx = gx, ly = gy;
    if (gx > 3)
        lx = MIN_IN_GROUP[gx] + vvc_dec_bypass_bits(d, (gx >> 1) - 1);
    if (gy > 3)
        ly = MIN_IN_GROUP[gy] + vvc_dec_bypass_bits(d, (gy >> 1) - 1);

    int last_scan = -1;
    for (int k = 0; k < n; k++)
        if (scan[2 * k] == lx && scan[2 * k + 1] == ly) {
            last_scan = k;
            break;
        }

    int last_cg = last_scan / cg_n;
    int cg_ctx_off = is_chroma ? 2 : 0;
    int gtx_base_off = is_chroma ? gtx_cb : 0;

    for (int cg = last_cg; cg >= 0; cg--) {
        int first = cg * cg_n, lastc = cg * cg_n + cg_n - 1;
        int cgx = scan[2 * first] / CG, cgy = scan[2 * first + 1] / CG;
        int coded = 1;
        if (cg != last_cg && cg != 0) {
            int right = 0, below = 0;
            for (int c2 = 0; c2 < num_cg; c2++) {
                int sx = scan[2 * (c2 * cg_n)] / CG;
                int sy = scan[2 * (c2 * cg_n) + 1] / CG;
                if (sx == cgx + 1 && sy == cgy) right = cg_flags[c2];
                if (sx == cgx && sy == cgy + 1) below = cg_flags[c2];
            }
            int inc = right + below;
            if (inc > 1) inc = 1;
            coded = vvc_dec_bin(d, cg_off_base + cg_ctx_off + inc, p0, p1,
                                sh0, sh1);
        }
        cg_flags[cg] = coded;
        if (!coded)
            continue;

        int start = (cg == last_cg) ? last_scan : lastc;
        int gt3_list[16 * 16];
        int gt3_par[16 * 16];
        int n_gt3 = 0;
        int sig_list[16 * 16];
        int n_sig = 0;
        for (int k = start; k >= first; k--) {
            int x = scan[2 * k], y = scan[2 * k + 1];
            int sig;
            if (k == last_scan)
                sig = 1;
            else
                sig = vvc_dec_bin(d, sig_ctx(abs_buf, x, y, w, h, is_chroma,
                                             sig_off, sig_cb),
                                  p0, p1, sh0, sh1);
            if (!sig)
                continue;
            sig_list[n_sig++] = k;
            int tsum = tmpl5_sum(abs_buf, x, y, w, h, 0);
            int tctx = (tsum + 1) >> 1;
            if (tctx > 3) tctx = 3;
            int dd = x + y;
            int dpart = is_chroma ? (dd == 0 ? 4 : 0)
                                  : (dd == 0 ? 8 : (dd < 3 ? 4 : 0));
            int tbase = gtx_base_off + dpart + tctx;
            int gt1 = vvc_dec_bin(d, gt1_off + tbase, p0, p1, sh0, sh1);
            int lvl = 1;
            if (gt1) {
                int par = vvc_dec_bin(d, par_off + tbase, p0, p1, sh0, sh1);
                int gt3 = vvc_dec_bin(d, gt3_off + tbase, p0, p1, sh0, sh1);
                lvl = 2 + par;
                if (gt3) {
                    lvl += 2;
                    gt3_list[n_gt3] = k;
                    gt3_par[n_gt3] = par;
                    n_gt3++;
                }
            }
            abs_buf[y * w + x] = lvl;
        }
        for (int i = 0; i < n_gt3; i++) {
            int k = gt3_list[i];
            int x = scan[2 * k], y = scan[2 * k + 1];
            int rice = rice_param(tmpl5_sum(abs_buf, x, y, w, h, 0));
            int rem = golomb_rice_dec(d, rice);
            abs_buf[y * w + x] = 4 + gt3_par[i] + 2 * rem;
        }
        for (int i = 0; i < n_sig; i++) {
            int k = sig_list[i];
            int x = scan[2 * k], y = scan[2 * k + 1];
            sign_buf[y * w + x] = vvc_dec_bypass(d);
        }
    }
    for (int k = 0; k < n; k++) {
        if (abs_buf[k])
            out[k] = sign_buf[k] ? -abs_buf[k] : abs_buf[k];
    }
}
