// Zhang-Shasha tree edit distance kernel.
//
// Native replacement for the reference's Python-level TEDn scoring, which was
// the stated GRPO bottleneck even across a 24-process pool (reference:
// acai_omr/train/omr_grpo_train.py:134-155, docs/training.md:71). Unit costs
// (insert = delete = 1, rename = 0/1 by label equality), O(n1*n2*min-depth)
// via the classic keyroots formulation.
//
// C ABI for ctypes: trees are postorder arrays of interned label ids plus
// leftmost-leaf-descendant index arrays (both 0-based, computed host-side).
//
// Build: make -C native   (produces libtedn.so)

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// labels: postorder label ids; lml: leftmost leaf index per postorder node.
int64_t tree_edit_distance(int32_t n1, const int32_t* labels1, const int32_t* lml1,
                           int32_t n2, const int32_t* labels2, const int32_t* lml2) {
    if (n1 == 0) return n2;
    if (n2 == 0) return n1;

    // keyroots: nodes with no parent sharing their leftmost leaf (i.e. the
    // highest node for each leftmost-leaf value in postorder)
    auto keyroots = [](int32_t n, const int32_t* lml) {
        std::vector<int32_t> kr;
        std::vector<char> seen(n, 0);
        for (int32_t i = n - 1; i >= 0; --i) {
            if (!seen[lml[i]]) {
                kr.push_back(i);
                seen[lml[i]] = 1;
            }
        }
        std::sort(kr.begin(), kr.end());
        return kr;
    };
    std::vector<int32_t> kr1 = keyroots(n1, lml1);
    std::vector<int32_t> kr2 = keyroots(n2, lml2);

    std::vector<int64_t> treedist((size_t)n1 * n2, 0);
    // forest distance scratch, (n1+1) x (n2+1)
    std::vector<int64_t> fd((size_t)(n1 + 1) * (n2 + 1), 0);
    const size_t stride = (size_t)n2 + 1;

    for (int32_t k1 : kr1) {
        const int32_t l1 = lml1[k1];
        for (int32_t k2 : kr2) {
            const int32_t l2 = lml2[k2];
            // fd indices are offsets from l1/l2; fd[di][dj] = distance between
            // forest labels1[l1..l1+di-1] and labels2[l2..l2+dj-1]
            const int32_t m = k1 - l1 + 1;
            const int32_t n = k2 - l2 + 1;
            fd[0] = 0;
            for (int32_t di = 1; di <= m; ++di) fd[(size_t)di * stride] = fd[(size_t)(di - 1) * stride] + 1;
            for (int32_t dj = 1; dj <= n; ++dj) fd[dj] = fd[dj - 1] + 1;
            for (int32_t di = 1; di <= m; ++di) {
                const int32_t i = l1 + di - 1;
                for (int32_t dj = 1; dj <= n; ++dj) {
                    const int32_t j = l2 + dj - 1;
                    const int64_t del = fd[(size_t)(di - 1) * stride + dj] + 1;
                    const int64_t ins = fd[(size_t)di * stride + (dj - 1)] + 1;
                    int64_t best = std::min(del, ins);
                    if (lml1[i] == l1 && lml2[j] == l2) {
                        const int64_t ren = fd[(size_t)(di - 1) * stride + (dj - 1)]
                                            + (labels1[i] == labels2[j] ? 0 : 1);
                        best = std::min(best, ren);
                        treedist[(size_t)i * n2 + j] = best;
                    } else {
                        const int32_t di2 = lml1[i] - l1;  // forest prefix before subtree i
                        const int32_t dj2 = lml2[j] - l2;
                        const int64_t sub = fd[(size_t)di2 * stride + dj2]
                                            + treedist[(size_t)i * n2 + j];
                        best = std::min(best, sub);
                    }
                    fd[(size_t)di * stride + dj] = best;
                }
            }
        }
    }
    return treedist[(size_t)(n1 - 1) * n2 + (n2 - 1)];
}

}  // extern "C"
