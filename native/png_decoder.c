/* Minimal grayscale PNG decoder for the KITTI frame loader.
 *
 * The reference's frame ingestion is native C++ via cv::imread
 * (reference: src/LoopHandler.cc:917-927). This is our native-path
 * equivalent: a dependency-light decoder for the image classes KITTI
 * actually ships (8-bit, non-interlaced, gray / gray+alpha / RGB / RGBA),
 * returning a row-major uint8 grayscale buffer. Color inputs are reduced
 * with integer BT.601 luma. Inflation is delegated to zlib.
 *
 * Exposed C ABI (used from Python via ctypes, see
 * ya_vo_tpu/io/native_loader.py):
 *   int yavo_png_decode_gray(const uint8_t* data, size_t size,
 *                            uint8_t* out, size_t out_cap,
 *                            int32_t* out_w, int32_t* out_h);
 * Returns 0 on success, negative error codes otherwise.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#define ERR_SIG -1
#define ERR_FORMAT -2
#define ERR_UNSUPPORTED -3
#define ERR_INFLATE -4
#define ERR_CAPACITY -5
#define ERR_ALLOC -6

static uint32_t rd_be32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static uint8_t paeth(uint8_t a, uint8_t b, uint8_t c) {
    int p = (int)a + (int)b - (int)c;
    int pa = abs(p - (int)a), pb = abs(p - (int)b), pc = abs(p - (int)c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

int yavo_png_decode_gray(const uint8_t *data, size_t size, uint8_t *out,
                         size_t out_cap, int32_t *out_w, int32_t *out_h) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (size < 8 || memcmp(data, sig, 8) != 0) return ERR_SIG;

    size_t pos = 8;
    uint32_t width = 0, height = 0;
    int bit_depth = 0, color_type = 0, interlace = 0;
    uint8_t *idat = NULL;
    size_t idat_size = 0, idat_cap = 0;
    int seen_ihdr = 0, seen_iend = 0;

    while (pos + 8 <= size && !seen_iend) {
        uint32_t len = rd_be32(data + pos);
        const uint8_t *type = data + pos + 4;
        if (pos + 12 + (size_t)len > size) { free(idat); return ERR_FORMAT; }
        const uint8_t *chunk = data + pos + 8;

        if (memcmp(type, "IHDR", 4) == 0) {
            if (len != 13) { free(idat); return ERR_FORMAT; }
            width = rd_be32(chunk);
            height = rd_be32(chunk + 4);
            bit_depth = chunk[8];
            color_type = chunk[9];
            interlace = chunk[12];
            seen_ihdr = 1;
            if (bit_depth != 8 || interlace != 0 ||
                (color_type != 0 && color_type != 2 && color_type != 4 &&
                 color_type != 6)) {
                free(idat);
                return ERR_UNSUPPORTED;
            }
        } else if (memcmp(type, "IDAT", 4) == 0) {
            if (!seen_ihdr) { free(idat); return ERR_FORMAT; }
            if (idat_size + len > idat_cap) {
                size_t ncap = idat_cap ? idat_cap * 2 : 1 << 16;
                while (ncap < idat_size + len) ncap *= 2;
                uint8_t *nbuf = realloc(idat, ncap);
                if (!nbuf) { free(idat); return ERR_ALLOC; }
                idat = nbuf;
                idat_cap = ncap;
            }
            memcpy(idat + idat_size, chunk, len);
            idat_size += len;
        } else if (memcmp(type, "IEND", 4) == 0) {
            seen_iend = 1;
        }
        pos += 12 + len;
    }
    if (!seen_ihdr || idat_size == 0 || width == 0 || height == 0) {
        free(idat);
        return ERR_FORMAT;
    }
    if ((size_t)width * height > out_cap) { free(idat); return ERR_CAPACITY; }

    int channels =
        color_type == 0 ? 1 : color_type == 2 ? 3 : color_type == 4 ? 2 : 4;
    size_t stride = (size_t)width * channels;
    size_t raw_size = (stride + 1) * height;
    uint8_t *raw = malloc(raw_size);
    if (!raw) { free(idat); return ERR_ALLOC; }

    uLongf dst_len = raw_size;
    int zrc = uncompress(raw, &dst_len, idat, idat_size);
    free(idat);
    if (zrc != Z_OK || dst_len != raw_size) { free(raw); return ERR_INFLATE; }

    /* per-row unfilter + luma reduction */
    uint8_t *prev = calloc(stride, 1);
    if (!prev) { free(raw); return ERR_ALLOC; }
    for (uint32_t y = 0; y < height; y++) {
        uint8_t *row = raw + (size_t)y * (stride + 1);
        uint8_t filter = row[0];
        uint8_t *cur = row + 1;
        for (size_t x = 0; x < stride; x++) {
            uint8_t a = x >= (size_t)channels ? cur[x - channels] : 0;
            uint8_t b = prev[x];
            uint8_t c = x >= (size_t)channels ? prev[x - channels] : 0;
            switch (filter) {
                case 0: break;
                case 1: cur[x] = (uint8_t)(cur[x] + a); break;
                case 2: cur[x] = (uint8_t)(cur[x] + b); break;
                case 3: cur[x] = (uint8_t)(cur[x] + ((a + b) >> 1)); break;
                case 4: cur[x] = (uint8_t)(cur[x] + paeth(a, b, c)); break;
                default:
                    free(prev);
                    free(raw);
                    return ERR_FORMAT;
            }
        }
        memcpy(prev, cur, stride);

        uint8_t *dst = out + (size_t)y * width;
        if (channels == 1) {
            memcpy(dst, cur, width);
        } else if (channels == 2) { /* gray + alpha */
            for (uint32_t x = 0; x < width; x++) dst[x] = cur[2 * x];
        } else { /* RGB / RGBA -> BT.601 integer luma */
            for (uint32_t x = 0; x < width; x++) {
                const uint8_t *px = cur + (size_t)x * channels;
                dst[x] = (uint8_t)((77 * px[0] + 150 * px[1] + 29 * px[2]) >> 8);
            }
        }
    }
    free(prev);
    free(raw);
    *out_w = (int32_t)width;
    *out_h = (int32_t)height;
    return 0;
}
