// COCO RLE codec — native fast path for the data pipeline.
//
// The reference stack leans on the pycocotools C extension for RLE
// decode/encode (SURVEY.md §2.3); this is our TPU-era equivalent: a small,
// dependency-free C++ library exposed through a C ABI and loaded via ctypes
// (sam2_video_tpu/data/rle_native.py). Hot paths: LEB128-ish string decode,
// run fill into a column-major mask buffer, and mask -> counts encode.

#include <cstdint>
#include <cstring>

extern "C" {

// Decode a compressed RLE counts string into int64 counts.
// Returns the number of counts written, or -1 on overflow.
int64_t rle_decode_counts(const char* s, int64_t n, int64_t* out,
                          int64_t max_out) {
    int64_t m = 0;
    int64_t i = 0;
    while (i < n) {
        int64_t x = 0;
        int k = 0;
        bool more = true;
        while (more && i < n) {
            int64_t c = (int64_t)(s[i]) - 48;
            x |= (c & 0x1F) << (5 * k);
            more = (c & 0x20) != 0;
            ++i;
            ++k;
            if (!more && (c & 0x10)) {
                x |= ~((int64_t)0) << (5 * k);
            }
        }
        if (m > 2) x += out[m - 2];
        if (m >= max_out) return -1;
        out[m++] = x;
    }
    return m;
}

// Fill a flat column-major mask from counts (alternating 0-run / 1-run).
// Returns 0 on success, -1 if counts overflow the buffer.
int64_t rle_fill(const int64_t* counts, int64_t n, uint8_t* mask,
                 int64_t total) {
    int64_t pos = 0;
    for (int64_t j = 0; j < n; ++j) {
        int64_t c = counts[j];
        if (c < 0 || pos + c > total) return -1;
        if (j & 1) {
            memset(mask + pos, 1, (size_t)c);
        } else {
            memset(mask + pos, 0, (size_t)c);
        }
        pos += c;
    }
    return pos == total ? 0 : -1;
}

// Compute run-length counts from a flat column-major binary mask.
// Returns number of counts, or -1 on overflow.
int64_t rle_from_mask(const uint8_t* mask, int64_t total, int64_t* out,
                      int64_t max_out) {
    int64_t m = 0;
    uint8_t cur = 0;  // runs start with background
    int64_t run = 0;
    for (int64_t i = 0; i < total; ++i) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v == cur) {
            ++run;
        } else {
            if (m >= max_out) return -1;
            out[m++] = run;
            cur = v;
            run = 1;
        }
    }
    if (m >= max_out) return -1;
    out[m++] = run;
    return m;
}

// Encode counts into the compressed ASCII representation.
// Returns string length, or -1 on overflow.
int64_t rle_encode_counts(const int64_t* counts, int64_t n, char* out,
                          int64_t max_out) {
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t x = counts[i];
        if (i > 2) x -= counts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1F;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            if (m >= max_out) return -1;
            out[m++] = (char)(c + 48);
        }
    }
    return m;
}

}  // extern "C"
