// Native host runtime for metalquicha-tpu.
//
// The combinatorial layers the reference implements in Fortran
// (combination enumeration: mqc_combinatorics.f90; FNV-hash subset lookup:
// mqc_fragment_lookup.f90; GMBE PIE DFS with linear-scan dedup:
// mqc_gmbe_utils.f90:655-769) are host-side and scale combinatorially with
// monomer count — they run here in C++ with hash-based dedup (O(1) per
// set vs the reference's O(T) linear scan), exposed to Python via ctypes.
// NumPy fallbacks exist for every entry point (metalquicha_tpu/native.py).
//
// Conventions: polymers are row-major int64 (F, L) padded with -1;
// atom sets are row-major int64 (T, max_atoms) padded with -1.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

using i64 = int64_t;

struct VecHash {
    size_t operator()(const std::vector<i64>& v) const {
        // FNV-1a over the set elements (the reference's lookup uses FNV-1a
        // on sorted monomer sets too)
        size_t h = 1469598103934665603ull;
        for (i64 x : v) {
            h ^= static_cast<size_t>(x);
            h *= 1099511628211ull;
        }
        return h;
    }
};

using SetMap = std::unordered_map<std::vector<i64>, i64, VecHash>;

std::vector<i64> row_key(const i64* row, i64 width) {
    std::vector<i64> key;
    key.reserve(width);
    for (i64 i = 0; i < width; ++i)
        if (row[i] >= 0) key.push_back(row[i]);
    // rows are produced sorted; sort defensively
    for (size_t i = 1; i < key.size(); ++i)
        for (size_t j = i; j > 0 && key[j - 1] > key[j]; --j)
            std::swap(key[j - 1], key[j]);
    return key;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Combination enumeration: all k-subsets of 0..M-1 for k=1..L, -1 padded.
// out must hold nfrags * L entries; returns the number of rows written.
// ---------------------------------------------------------------------------
i64 mqc_enumerate_polymers(i64 n_monomers, i64 max_level, i64* out) {
    i64 rows = 0;
    std::vector<i64> combo(max_level);
    for (i64 k = 1; k <= max_level; ++k) {
        for (i64 i = 0; i < k; ++i) combo[i] = i;
        while (true) {
            i64* row = out + rows * max_level;
            for (i64 i = 0; i < k; ++i) row[i] = combo[i];
            for (i64 i = k; i < max_level; ++i) row[i] = -1;
            ++rows;
            // next lexicographic k-combination
            i64 pos = k - 1;
            while (pos >= 0 && combo[pos] == n_monomers - k + pos) --pos;
            if (pos < 0) break;
            ++combo[pos];
            for (i64 i = pos + 1; i < k; ++i) combo[i] = combo[i - 1] + 1;
        }
    }
    return rows;
}

// ---------------------------------------------------------------------------
// Inclusion-exclusion weights: c_f = sum_{g in family, g superset f}
// (-1)^(|g|-|f|). Returns 0 on success, -1 if the family is not
// subset-closed (missing subset).
// ---------------------------------------------------------------------------
i64 mqc_mbe_weights(const i64* polymers, i64 n_frags, i64 width, i64* weights) {
    SetMap lookup;
    lookup.reserve(static_cast<size_t>(n_frags) * 2);
    for (i64 f = 0; f < n_frags; ++f)
        lookup.emplace(row_key(polymers + f * width, width), f);

    for (i64 f = 0; f < n_frags; ++f) weights[f] = 0;

    std::vector<i64> subset;
    for (i64 g = 0; g < n_frags; ++g) {
        auto mono = row_key(polymers + g * width, width);
        const i64 n = static_cast<i64>(mono.size());
        // enumerate all non-empty subsets via bitmask (n <= MAX_MBE_LEVEL)
        for (i64 mask = 1; mask < (i64(1) << n); ++mask) {
            subset.clear();
            for (i64 b = 0; b < n; ++b)
                if (mask & (i64(1) << b)) subset.push_back(mono[b]);
            auto it = lookup.find(subset);
            if (it == lookup.end()) return -1;  // closure violated
            const i64 r = static_cast<i64>(subset.size());
            weights[it->second] += ((n - r) % 2 == 0) ? 1 : -1;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Per-fragment delta energies (bottom-up recurrence), for the JSON breakdown.
// Assumes `polymers` is subset-closed; returns 0 / -1 as above.
// ---------------------------------------------------------------------------
i64 mqc_mbe_deltas(const i64* polymers, i64 n_frags, i64 width,
                   const double* energies, double* deltas) {
    SetMap lookup;
    lookup.reserve(static_cast<size_t>(n_frags) * 2);
    std::vector<i64> levels(n_frags);
    i64 max_level = 0;
    for (i64 f = 0; f < n_frags; ++f) {
        auto key = row_key(polymers + f * width, width);
        levels[f] = static_cast<i64>(key.size());
        if (levels[f] > max_level) max_level = levels[f];
        lookup.emplace(std::move(key), f);
    }
    std::vector<i64> subset;
    for (i64 lvl = 1; lvl <= max_level; ++lvl) {
        for (i64 f = 0; f < n_frags; ++f) {
            if (levels[f] != lvl) continue;
            auto mono = row_key(polymers + f * width, width);
            double acc = energies[f];
            const i64 n = lvl;
            for (i64 mask = 1; mask < (i64(1) << n) - 1; ++mask) {
                subset.clear();
                for (i64 b = 0; b < n; ++b)
                    if (mask & (i64(1) << b)) subset.push_back(mono[b]);
                auto it = lookup.find(subset);
                if (it == lookup.end()) return -1;
                acc -= deltas[it->second];
            }
            deltas[f] = acc;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// GMBE PIE enumeration: DFS over overlapping cliques of primary atom sets,
// accumulating (+1/-1)^(clique size) per UNIQUE intersection (hash dedup).
//
// primaries: (P, max_atoms) padded with -1, each row SORTED ascending.
// out_sets: (cap_terms, max_atoms); out_coeffs: (cap_terms).
// Returns the number of unique terms (zero-coefficient terms removed,
// compacted in place), or -1 if cap_terms was exceeded.
// ---------------------------------------------------------------------------
namespace {

struct PieState {
    const i64* primaries;
    i64 n_prim, width, cap_terms, max_depth;
    i64* out_sets;
    i64* out_coeffs;
    i64 n_terms = 0;
    SetMap dedup;
    std::vector<i64> prim_len;

    bool add_term(const std::vector<i64>& atoms, i64 sign) {
        auto it = dedup.find(atoms);
        if (it != dedup.end()) {
            out_coeffs[it->second] += sign;
            return true;
        }
        if (n_terms >= cap_terms) return false;
        i64* row = out_sets + n_terms * width;
        for (size_t i = 0; i < atoms.size(); ++i) row[i] = atoms[i];
        for (i64 i = static_cast<i64>(atoms.size()); i < width; ++i) row[i] = -1;
        out_coeffs[n_terms] = sign;
        dedup.emplace(atoms, n_terms);
        ++n_terms;
        return true;
    }

    // intersection of sorted vectors
    static std::vector<i64> intersect(const std::vector<i64>& a, const i64* b,
                                      i64 blen) {
        std::vector<i64> out;
        size_t i = 0;
        i64 j = 0;
        while (i < a.size() && j < blen) {
            if (a[i] == b[j]) {
                out.push_back(a[i]);
                ++i;
                ++j;
            } else if (a[i] < b[j]) {
                ++i;
            } else {
                ++j;
            }
        }
        return out;
    }

    bool dfs(i64 last, const std::vector<i64>& inter, i64 depth) {
        if (depth >= max_depth) return true;
        for (i64 j = last + 1; j < n_prim; ++j) {
            auto nxt = intersect(inter, primaries + j * width, prim_len[j]);
            if (nxt.empty()) continue;
            const i64 sign = ((depth + 1) % 2 == 1) ? 1 : -1;
            if (!add_term(nxt, sign)) return false;
            if (!dfs(j, nxt, depth + 1)) return false;
        }
        return true;
    }
};

}  // namespace

i64 mqc_pie_enumerate(const i64* primaries, i64 n_prim, i64 width,
                      i64 max_depth, i64* out_sets, i64* out_coeffs,
                      i64 cap_terms) {
    PieState st{primaries, n_prim, width, cap_terms, max_depth,
                out_sets,  out_coeffs};
    st.prim_len.resize(n_prim);
    for (i64 p = 0; p < n_prim; ++p) {
        i64 len = 0;
        const i64* row = primaries + p * width;
        while (len < width && row[len] >= 0) ++len;
        st.prim_len[p] = len;
    }
    for (i64 p = 0; p < n_prim; ++p) {
        std::vector<i64> self(primaries + p * width,
                              primaries + p * width + st.prim_len[p]);
        if (!st.add_term(self, 1)) return -1;
        if (!st.dfs(p, self, 1)) return -1;
    }
    // compact away zero-coefficient terms
    i64 kept = 0;
    for (i64 t = 0; t < st.n_terms; ++t) {
        if (out_coeffs[t] == 0) continue;
        if (kept != t) {
            std::memcpy(out_sets + kept * width, out_sets + t * width,
                        sizeof(i64) * width);
            out_coeffs[kept] = out_coeffs[t];
        }
        ++kept;
    }
    return kept;
}

}  // extern "C"
