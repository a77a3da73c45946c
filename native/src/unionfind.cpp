// Union-find merge engine for duplicate-person grouping.
//
// Host-side post-processing of the TPU's G x G similarity matmul
// (gallery/dedup.py): the thresholded pair list collapses into merge groups
// here. Path-halving + union-by-min-id so every group's root is its lowest
// id — matching the reference's "merge person2 into person1" convention
// (smart_face_recognition.py:2679-2724).

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

int64_t find_root(std::vector<int64_t>& parent, int64_t x) {
    while (parent[static_cast<size_t>(x)] != x) {
        parent[static_cast<size_t>(x)] =
            parent[static_cast<size_t>(parent[static_cast<size_t>(x)])];
        x = parent[static_cast<size_t>(x)];
    }
    return x;
}

}  // namespace

extern "C" {

// n items (0..n-1); m pairs laid out as pairs[2*i], pairs[2*i+1].
// Fills root_out[n] with each item's group root (min index in group).
// Returns number of non-trivial groups (size >= 2).
int64_t uf_groups(int64_t n, const int64_t* pairs, int64_t m,
                  int64_t* root_out) {
    std::vector<int64_t> parent(static_cast<size_t>(n));
    for (int64_t i = 0; i < n; i++) parent[static_cast<size_t>(i)] = i;

    for (int64_t i = 0; i < m; i++) {
        int64_t a = pairs[2 * i], b = pairs[2 * i + 1];
        if (a < 0 || b < 0 || a >= n || b >= n) continue;
        int64_t ra = find_root(parent, a), rb = find_root(parent, b);
        if (ra == rb) continue;
        if (ra < rb)
            parent[static_cast<size_t>(rb)] = ra;
        else
            parent[static_cast<size_t>(ra)] = rb;
    }

    std::vector<int64_t> group_size(static_cast<size_t>(n), 0);
    for (int64_t i = 0; i < n; i++) {
        int64_t r = find_root(parent, i);
        root_out[i] = r;
        group_size[static_cast<size_t>(r)] += 1;
    }
    int64_t groups = 0;
    for (int64_t i = 0; i < n; i++)
        if (root_out[i] == i && group_size[static_cast<size_t>(i)] >= 2)
            groups += 1;
    return groups;
}

}  // extern "C"
