// Native planner-table kernels for overcooked_ai_tpu.
//
// The joint two-agent motion planner (overcooked_ai_tpu/planning/joint.py;
// reference JointMotionPlanner, planning/planners.py:453-1104) needs
// all-pairs shortest paths over the joint-position-pair graph: up to ~2.5k
// nodes x ~60k edges with edge costs in {1, 2}. The pure-Python Dijkstra
// takes ~70 s on the largest shipped layout (corridor); this C++ version
// runs it in milliseconds using Dial's bucket queue (O(V + E) per source
// for small integer costs). Loaded via ctypes (overcooked_ai_tpu/planning/
// _native.py) with the Python implementation as fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <vector>

extern "C" {

// All-pairs shortest path over a CSR graph with small non-negative integer
// edge costs (max_cost <= 15 enforced by the caller). Writes n*n int32
// distances into `out`, `inf` where unreachable.
//
//   indptr:  (n+1,) CSR row pointers
//   indices: (nnz,) edge targets
//   costs:   (nnz,) edge costs
void all_pairs_shortest(const int32_t* indptr, const int32_t* indices,
                        const int32_t* costs, int32_t n, int32_t max_cost,
                        int32_t inf, int32_t* out) {
    // Dial's algorithm: circular array of (max_cost + 1) buckets.
    const int n_buckets = max_cost + 1;
    std::vector<std::vector<int32_t>> buckets(n_buckets);
    for (int32_t src = 0; src < n; ++src) {
        int32_t* dist = out + static_cast<int64_t>(src) * n;
        for (int32_t i = 0; i < n; ++i) dist[i] = inf;
        dist[src] = 0;
        for (auto& b : buckets) b.clear();
        buckets[0].push_back(src);
        int32_t remaining = 1;
        int32_t d = 0;
        while (remaining > 0) {
            auto& bucket = buckets[d % n_buckets];
            while (!bucket.empty()) {
                int32_t u = bucket.back();
                bucket.pop_back();
                --remaining;
                if (dist[u] != d) continue;  // stale entry
                for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
                    int32_t v = indices[e];
                    int32_t nd = d + costs[e];
                    if (nd < dist[v]) {
                        dist[v] = nd;
                        buckets[nd % n_buckets].push_back(v);
                        ++remaining;
                    }
                }
            }
            ++d;
        }
    }
}

// Unit-cost BFS from every node of a CSR graph (the motion-planner graph,
// overcooked_ai_tpu/planning/tables.py). Same output convention as above.
void all_pairs_bfs(const int32_t* indptr, const int32_t* indices, int32_t n,
                   int32_t inf, int32_t* out) {
    std::vector<int32_t> frontier, next;
    for (int32_t src = 0; src < n; ++src) {
        int32_t* dist = out + static_cast<int64_t>(src) * n;
        for (int32_t i = 0; i < n; ++i) dist[i] = inf;
        dist[src] = 0;
        frontier.assign(1, src);
        int32_t d = 0;
        while (!frontier.empty()) {
            ++d;
            next.clear();
            for (int32_t u : frontier) {
                for (int32_t e = indptr[u]; e < indptr[u + 1]; ++e) {
                    int32_t v = indices[e];
                    if (dist[v] == inf) {
                        dist[v] = d;
                        next.push_back(v);
                    }
                }
            }
            frontier.swap(next);
        }
    }
}

}  // extern "C"
