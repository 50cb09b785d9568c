// C++ self-test for the native I/O core (round-trip + CSR build invariants).
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

// NDEBUG-proof check: CHECK() would compile the tested CALLS out of an -DNDEBUG build
// and the self-test would pass while testing nothing.
#define CHECK(cond)                                                                \
    do {                                                                           \
        if (!(cond)) {                                                             \
            std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,          \
                         __LINE__, #cond);                                         \
            std::abort();                                                          \
        }                                                                          \
    } while (0)

extern "C" {
int mtx_read_header(const char*, int64_t*, int64_t*, int64_t*, int64_t*);
int64_t mtx_read_entries(const char*, int64_t, int64_t*, int64_t*, double*);
int64_t mtx_write_stencil5(const char*, int64_t, double, double);
int coo_to_csr_sorted(int64_t, int64_t, const int64_t*, const int64_t*, const double*,
                      int64_t*, int64_t*, double*);
}

int main() {
    const char* path = "/tmp/mtxio_selftest.mtx";
    const int64_t g = 13;
    const int64_t n = g * g;
    const int64_t nnz = mtx_write_stencil5(path, g, 5.0, -1.0);
    CHECK(nnz == 5 * n - 4 * g);

    int64_t rows, cols, count, grid;
    CHECK(mtx_read_header(path, &rows, &cols, &count, &grid) == 0);
    CHECK(rows == n && cols == n && count == nnz && grid == g);

    std::vector<int64_t> r(nnz), c(nnz);
    std::vector<double> v(nnz);
    CHECK(mtx_read_entries(path, nnz, r.data(), c.data(), v.data()) == nnz);

    // checksum of y = A*ones: diag + offdiag*neighbors summed over all entries
    double total = 0;
    for (int64_t k = 0; k < nnz; ++k) total += v[k];
    const double expected = 5.0 * n - 1.0 * (4 * n - 4 * g);
    CHECK(std::fabs(total - expected) < 1e-9);

    std::vector<int64_t> row_ptr(n + 1), col_idx(nnz);
    std::vector<double> val(nnz);
    CHECK(coo_to_csr_sorted(n, nnz, r.data(), c.data(), v.data(), row_ptr.data(),
                             col_idx.data(), val.data()) == 0);
    CHECK(row_ptr[n] == nnz);
    for (int64_t i = 0; i < n; ++i)
        for (int64_t k = row_ptr[i] + 1; k < row_ptr[i + 1]; ++k)
            CHECK(col_idx[k] > col_idx[k - 1]);  // sorted-row invariant

    // interior row has exactly [N,W,C,E,S] at offsets -g,-1,0,+1,+g
    const int64_t mid = (g / 2) * g + g / 2;
    CHECK(row_ptr[mid + 1] - row_ptr[mid] == 5);
    const int64_t offs[5] = {-g, -1, 0, 1, g};
    for (int k = 0; k < 5; ++k)
        CHECK(col_idx[row_ptr[mid] + k] == mid + offs[k]);

    remove(path);
    printf("mtxio self-test: OK\n");
    return 0;
}
