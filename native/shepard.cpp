// Exponential modified-Shepard scattered-data interpolation — native CPU path.
//
// The reference ships this kernel as Cython compiled with
// -O3 -march=native -fopenmp (surfh/ToolsDir/shepard_interpolation.pyx:76-141,
// build.py:11-13) but its inner loop is serial.  This implementation
// parallelizes over output grid points with OpenMP and keeps the exact
// reference semantics: pixel-unit distances, epsilon added to the distance,
// cutoff test BEFORE weighting, zero where no point is in range.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdint>

extern "C" {

// alpha_coord/lambda_coord/values: [n_points]
// alpha_mesh/lambda_mesh:          [n_grid] (flattened mesh)
// out:                             [n_grid]
void exponential_modified_shepard(
    const float* alpha_coord,
    const float* lambda_coord,
    const float* values,
    int64_t n_points,
    const float* alpha_mesh,
    const float* lambda_mesh,
    int64_t n_grid,
    float p,
    float alpha,
    float pixel_cutoff,
    float alpha_res,
    float lambda_res,
    float epsilon,
    float* out)
{
    const float inv_ar = 1.0f / alpha_res;
    const float inv_lr = 1.0f / lambda_res;

#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < n_grid; ++g) {
        const float ga = alpha_mesh[g];
        const float gl = lambda_mesh[g];
        float num = 0.0f;
        float den = 0.0f;
        for (int64_t k = 0; k < n_points; ++k) {
            const float da = (alpha_coord[k] - ga) * inv_ar;
            const float dl = (lambda_coord[k] - gl) * inv_lr;
            const float dist = std::sqrt(da * da + dl * dl) + epsilon;
            if (dist <= pixel_cutoff) {
                const float w = std::exp(-alpha * std::pow(dist, p));
                num += w * values[k];
                den += w;
            }
        }
        out[g] = (den != 0.0f) ? num / den : 0.0f;
    }
}

}  // extern "C"
