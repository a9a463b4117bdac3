/* ttrt native runtime: host-side hot paths of the terminal ray tracer.
 *
 * TPU-native analog of the reference's native output layer
 * (buffered_draw_screen, TerminalRayTracer.c:1101-1172): the device ships a
 * COMPACT (H, W, 3) uint8 framebuffer (the smallest possible wire format
 * across the host<->device link) and this module expands it into the ANSI
 * truecolor escape stream with the reference's template-patching trick:
 * build the constant escape template once, then per frame overwrite only
 * the 9 digit bytes per pixel via a precomputed 256x3 digit table.
 *
 * Also provides: absolute-deadline frame pacing (clock_nanosleep
 * TIMER_ABSTIME — drift-free, unlike sleep(remaining)), full-buffer
 * write(2) with EINTR/partial handling (the reference's single fwrite,
 * TerminalRayTracer.c:1171), and a monotonic clock (timespec_get,
 * TerminalRayTracer.c:1320).
 *
 * Exposed via ctypes (no pybind11 in this image); see ttrt/native/.
 */

#include <errno.h>
#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

#define PIXEL_BYTES 25 /* \033[48;2;RRR;GGG;BBBm  \033[0m */
#define RESET_LEN 6    /* \033[0;0H */

static const char PIXEL_TEMPLATE[PIXEL_BYTES + 1] =
    "\033[48;2;000;000;000m  \033[0m";
static const char RESET_STR[RESET_LEN + 1] = "\033[0;0H";

/* 256 x 3 ASCII digit table, built on first use. */
static uint8_t digit3[256][3];
static int digit3_ready = 0;

static void build_digit3(void) {
    for (int v = 0; v < 256; v++) {
        digit3[v][0] = (uint8_t)('0' + v / 100);
        digit3[v][1] = (uint8_t)('0' + (v / 10) % 10);
        digit3[v][2] = (uint8_t)('0' + v % 10);
    }
    digit3_ready = 1;
}

/* Required output buffer size for an H x W frame. */
long ttrt_ansi_size(int height, int width) {
    return RESET_LEN + (long)height * ((long)width * PIXEL_BYTES + 1);
}

/* Build the constant frame template (escape skeleton + newlines) into out
 * (size ttrt_ansi_size). Call once per resolution; encode patches digits. */
void ttrt_init_template(int height, int width, uint8_t *out) {
    memcpy(out, RESET_STR, RESET_LEN);
    uint8_t *p = out + RESET_LEN;
    for (int r = 0; r < height; r++) {
        for (int c = 0; c < width; c++) {
            memcpy(p, PIXEL_TEMPLATE, PIXEL_BYTES);
            p += PIXEL_BYTES;
        }
        *p++ = '\n';
    }
}

/* Patch the RGB digit fields of a prebuilt template in place.
 * rgb: H*W*3 uint8, row-major. out: template from ttrt_init_template. */
void ttrt_encode_ansi(const uint8_t *rgb, int height, int width,
                      uint8_t *out) {
    if (!digit3_ready) build_digit3();
    uint8_t *p = out + RESET_LEN;
    long n = (long)height * width;
    for (long i = 0; i < n; i++) {
        const uint8_t *d0 = digit3[rgb[0]];
        const uint8_t *d1 = digit3[rgb[1]];
        const uint8_t *d2 = digit3[rgb[2]];
        /* offsets 7..9, 11..13, 15..17 within the 25-byte cell */
        p[7] = d0[0];  p[8] = d0[1];  p[9] = d0[2];
        p[11] = d1[0]; p[12] = d1[1]; p[13] = d1[2];
        p[15] = d2[0]; p[16] = d2[1]; p[17] = d2[2];
        rgb += 3;
        p += PIXEL_BYTES;
        /* skip the newline at end of each row */
        if ((i + 1) % width == 0) p += 1;
    }
}

/* Full write with EINTR/partial handling; returns 0 on success, -1 error. */
int ttrt_write_full(int fd, const uint8_t *buf, long n) {
    long off = 0;
    while (off < n) {
        ssize_t w = write(fd, buf + off, (size_t)(n - off));
        if (w < 0) {
            if (errno == EINTR) continue;
            return -1;
        }
        off += w;
    }
    return 0;
}

/* Monotonic clock in seconds. */
double ttrt_monotonic(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

/* Sleep until an absolute CLOCK_MONOTONIC deadline (seconds). Drift-free
 * frame pacing: deadlines advance by exactly frame_duration each frame
 * regardless of render jitter (vs the reference's relative nanosleep of the
 * remaining budget, TerminalRayTracer.c:1350-1355). */
void ttrt_sleep_until(double deadline) {
    struct timespec ts;
    ts.tv_sec = (time_t)deadline;
    ts.tv_nsec = (long)((deadline - (double)ts.tv_sec) * 1e9);
    if (ts.tv_nsec >= 1000000000L) {
        ts.tv_sec += 1;
        ts.tv_nsec -= 1000000000L;
    }
    while (clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &ts, NULL) ==
           EINTR) {
    }
}
