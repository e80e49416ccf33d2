// Fast velodyne-to-depth projection (native counterpart of
// behindthescenes_tpu/datasets/kitti_raw.py::project_velodyne_to_depth).
//
// The numpy implementation resolves duplicate pixels with a Counter loop in
// Python (reference kitti_raw_dataset.py:284-291); at ~120k points per scan
// this dominates eval data loading. Here: single pass, per-pixel min depth.
//
// Build: make -C behindthescenes_tpu/native   (or auto-built on first use)

#include <cmath>
#include <cstdint>

extern "C" {

// pts: (n, 4) float32 rows [x, y, z, 1]; p_mat: 3x4 row-major projection;
// depth_out: (h, w) float32, caller-zeroed.
// Semantics: KITTI matlab convention u = round(u_px) - 1, v = round(v_px)-1;
// points with x < 0 (behind the sensor) are dropped; duplicate pixels keep
// the minimum depth; negative depths are zeroed.
void project_velodyne_depth(const float* pts, int64_t n, const float* p_mat,
                            int64_t h, int64_t w, float* depth_out) {
    for (int64_t i = 0; i < n; ++i) {
        const float x = pts[i * 4 + 0];
        const float y = pts[i * 4 + 1];
        const float z = pts[i * 4 + 2];
        if (x < 0.f) continue;

        const float u_h = p_mat[0] * x + p_mat[1] * y + p_mat[2] * z + p_mat[3];
        const float v_h = p_mat[4] * x + p_mat[5] * y + p_mat[6] * z + p_mat[7];
        const float d = p_mat[8] * x + p_mat[9] * y + p_mat[10] * z + p_mat[11];
        if (d <= 0.f) continue;

        const int64_t u = static_cast<int64_t>(std::nearbyint(u_h / d)) - 1;
        const int64_t v = static_cast<int64_t>(std::nearbyint(v_h / d)) - 1;
        if (u < 0 || v < 0 || u >= w || v >= h) continue;

        float* cell = depth_out + v * w + u;
        if (*cell == 0.f || d < *cell) *cell = d;
    }
}

}  // extern "C"
