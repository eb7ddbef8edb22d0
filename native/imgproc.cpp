// Fused host-side image preprocessing: antialiased bicubic resize (+ optional
// direct patchify) for the TPU input pipeline.
//
// Native replacement for the torchvision resize kernels the reference leans on
// (reference: acai_omr/utils/utils.py:356-361 DynamicResize bicubic+antialias)
// — the hot host op of the data loader. Single-channel float32 images.
// Releases no Python state: call via ctypes from worker threads (GIL-free).
//
// Filter matches PIL/torchvision "bicubic, antialias=True": Keys kernel with
// a = -0.5, support 2.0, scaled by the downsampling factor.
//
// Build: make -C native libimgproc.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline float bicubic(float x) {
    constexpr float a = -0.5f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

struct Weights {
    std::vector<float> w;     // flattened [out, ksize]
    std::vector<int32_t> lo;  // first source index per output
    int ksize;
};

// Precompute antialiased bicubic weights for one axis (PIL-style).
Weights axis_weights(int in_size, int out_size) {
    const double scale = (double)in_size / out_size;
    const double filterscale = std::max(scale, 1.0);
    const double support = 2.0 * filterscale;
    const int ksize = (int)std::ceil(support) * 2 + 1;

    Weights W;
    W.ksize = ksize;
    W.w.assign((size_t)out_size * ksize, 0.0f);
    W.lo.assign(out_size, 0);

    for (int xx = 0; xx < out_size; ++xx) {
        const double center = (xx + 0.5) * scale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        const int n = xmax - xmin;
        double total = 0.0;
        std::vector<double> tmp(n);
        for (int i = 0; i < n; ++i) {
            const double wv = bicubic((float)((xmin + i - center + 0.5) / filterscale));
            tmp[i] = wv;
            total += wv;
        }
        W.lo[xx] = xmin;
        if (total != 0.0) {
            for (int i = 0; i < n; ++i)
                W.w[(size_t)xx * ksize + i] = (float)(tmp[i] / total);
        }
    }
    return W;
}

}  // namespace

extern "C" {

// Antialiased bicubic resize, single channel (H, W) float32 row-major.
void resize_bicubic(const float* src, int32_t sh, int32_t sw,
                    float* dst, int32_t th, int32_t tw) {
    Weights Wh = axis_weights(sh, th);
    Weights Ww = axis_weights(sw, tw);

    // horizontal pass: (sh, sw) -> (sh, tw)
    std::vector<float> tmp((size_t)sh * tw);
    for (int y = 0; y < sh; ++y) {
        const float* row = src + (size_t)y * sw;
        for (int x = 0; x < tw; ++x) {
            const float* w = &Ww.w[(size_t)x * Ww.ksize];
            const int lo = Ww.lo[x];
            const int n = std::min(Ww.ksize, sw - lo);
            float acc = 0.0f;
            for (int i = 0; i < n; ++i) acc += w[i] * row[lo + i];
            tmp[(size_t)y * tw + x] = acc;
        }
    }
    // vertical pass: (sh, tw) -> (th, tw)
    for (int y = 0; y < th; ++y) {
        const float* w = &Wh.w[(size_t)y * Wh.ksize];
        const int lo = Wh.lo[y];
        const int n = std::min(Wh.ksize, sh - lo);
        float* out = dst + (size_t)y * tw;
        std::fill(out, out + tw, 0.0f);
        for (int i = 0; i < n; ++i) {
            const float* row = &tmp[(size_t)(lo + i) * tw];
            const float wi = w[i];
            for (int x = 0; x < tw; ++x) out[x] += wi * row[x];
        }
    }
}

// Resize then emit (hp*wp, P*P) patches directly (row-major patch grid,
// row-major pixels — nn.Unfold order), with [0,1] clamping fused in.
void resize_patchify(const float* src, int32_t sh, int32_t sw,
                     float* patches, int32_t th, int32_t tw, int32_t p) {
    std::vector<float> resized((size_t)th * tw);
    resize_bicubic(src, sh, sw, resized.data(), th, tw);
    const int hp = th / p, wp = tw / p;
    for (int r = 0; r < hp; ++r)
        for (int c = 0; c < wp; ++c) {
            float* out = patches + ((size_t)r * wp + c) * p * p;
            for (int py = 0; py < p; ++py)
                for (int px = 0; px < p; ++px) {
                    float v = resized[(size_t)(r * p + py) * tw + c * p + px];
                    out[(size_t)py * p + px] = std::min(1.0f, std::max(0.0f, v));
                }
        }
}

}  // extern "C"
