// Native host-side event-batch builder.
//
// The TPU pipeline consumes padded struct-of-arrays batches
// [event_group x shower_slot]; building them from the per-shower input
// tables is a pure host task that becomes the bottleneck at production scale
// (1e7+ showers) if done with Python loops. This mirrors the reference's use
// of native code for host hot spots (its C++ ray tracer / GSL attenuation,
// NuRadioMC/SignalProp/CPPAnalyticRayTracing) — but for the data-plane
// runtime instead of physics (the physics runs batched on the TPU).
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).
//
// Build:  g++ -O3 -shared -fPIC -o libbatch_builder.so batch_builder.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Stable-sort permutation of group ids; returns the number of unique groups.
// order_out[n], group_start_out[<=n], group_count_out[<=n] must be
// preallocated with n elements.
int64_t group_showers(const int64_t* group_ids, int64_t n,
                      int64_t* order_out, int64_t* group_start_out,
                      int64_t* group_count_out, int64_t* unique_ids_out) {
    std::vector<int64_t> order(n);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return group_ids[a] < group_ids[b]; });

    int64_t n_groups = 0;
    int64_t i = 0;
    while (i < n) {
        int64_t gid = group_ids[order[i]];
        int64_t start = i;
        while (i < n && group_ids[order[i]] == gid) ++i;
        unique_ids_out[n_groups] = gid;
        group_start_out[n_groups] = start;
        group_count_out[n_groups] = i - start;
        ++n_groups;
    }
    std::memcpy(order_out, order.data(), n * sizeof(int64_t));
    return n_groups;
}

// Scatter a per-shower column into the padded [n_groups, s_max] layout.
// `fill` initializes padding slots.
void pad_column(const double* src, const int64_t* order,
                const int64_t* group_start, const int64_t* group_count,
                int64_t n_groups, int64_t s_max, double fill, double* dst) {
    for (int64_t g = 0; g < n_groups; ++g) {
        double* row = dst + g * s_max;
        int64_t cnt = group_count[g];
        const int64_t* idx = order + group_start[g];
        int64_t s = 0;
        for (; s < cnt && s < s_max; ++s) row[s] = src[idx[s]];
        for (; s < s_max; ++s) row[s] = fill;
    }
}

// Same for the shower validity mask (count-based).
void pad_mask(const int64_t* group_count, int64_t n_groups, int64_t s_max,
              uint8_t* dst) {
    for (int64_t g = 0; g < n_groups; ++g) {
        uint8_t* row = dst + g * s_max;
        int64_t cnt = std::min(group_count[g], s_max);
        for (int64_t s = 0; s < cnt; ++s) row[s] = 1;
        for (int64_t s = cnt; s < s_max; ++s) row[s] = 0;
    }
}

}  // extern "C"
