/* Wavefront dependency leveller — native twin of the Python loop in
 * vvctpu/pipeline/wave.py build_schedule.
 *
 * For each phase-B leaf (in coding order) computes the earliest wave in
 * which every geometrically-available reference producer has completed:
 * lv = 1 + max(level over the above strip [x-8, x+w+h] and the left strip
 * [y-8, y+w+h], plus the IBC source rect), then stamps the leaf's own
 * granule rect with lv.  Identical arithmetic to the Python reference
 * (tests/test_wave.py parity covers the resulting schedule via bytes).
 *
 * Inputs:
 *   slots   (n, stride) int32 slot rows ([op, x, y, ., bvx, bvy, ...])
 *   geom    (n, 3) int32 per-slot [w, h, is_ibc]; w == 0 marks non-phase-B
 *   gH, gW  granule grid dims (frame_h/8, frame_w/8)
 * Output: lv_out (n,) int32 wave level (0 for non-phase-B rows).
 */
#include <stdint.h>

static inline int32_t imax(int32_t a, int32_t b) { return a > b ? a : b; }
static inline int32_t imin(int32_t a, int32_t b) { return a < b ? a : b; }

void vvc_wave_levels(const int32_t *slots, int64_t n, int32_t stride,
                     const int32_t *geom, int32_t gH, int32_t gW,
                     int32_t frame_w, int32_t frame_h, int32_t *lvl_map,
                     int32_t *lv_out)
{
    for (int64_t i = 0; i < n; i++) {
        int32_t w = geom[3 * i], h = geom[3 * i + 1], ibc = geom[3 * i + 2];
        if (w == 0) { lv_out[i] = 0; continue; }
        const int32_t *row = slots + i * stride;
        int32_t x = row[1], y = row[2];
        int32_t reach = w + h;
        int32_t lv = 0;
        int32_t gy = y / 8 - 1;
        if (gy >= 0) {
            int32_t gx0 = imax((x - 8) / 8, 0);
            int32_t gx1 = imin((x + reach) / 8, gW - 1);
            const int32_t *r = lvl_map + gy * gW;
            for (int32_t gx = gx0; gx <= gx1; gx++) lv = imax(lv, r[gx]);
        }
        int32_t gx = x / 8 - 1;
        if (gx >= 0) {
            int32_t gy0 = imax((y - 8) / 8, 0);
            int32_t gy1 = imin((y + reach) / 8, gH - 1);
            for (int32_t g = gy0; g <= gy1; g++)
                lv = imax(lv, lvl_map[g * gW + gx]);
        }
        if (ibc) {
            int32_t sx = imin(imax(x + row[4], 0), frame_w - w);
            int32_t sy = imin(imax(y + row[5], 0), frame_h - h);
            for (int32_t g = sy / 8; g <= (sy + h - 1) / 8; g++)
                for (int32_t c = sx / 8; c <= (sx + w - 1) / 8; c++)
                    lv = imax(lv, lvl_map[g * gW + c]);
        }
        lv += 1;
        for (int32_t g = y / 8; g <= (y + h - 1) / 8; g++)
            for (int32_t c = x / 8; c <= (x + w - 1) / 8; c++)
                lvl_map[g * gW + c] = lv;
        lv_out[i] = lv;
    }
}
