// Native host-chemistry worker for ml_conformer_generator_tpu.
//
// The reference delegates per-molecule host chemistry to RDKit's C++ core
// through Python bindings (SURVEY.md §2.4); this framework's chemistry layer
// is first-party, and this library is its native fast path: the per-sample
// graph algorithms that sit between device stages of the generation pipeline
// (conformer_generator.py:268-368 in the reference) and would otherwise run
// as Python loops for every generated molecule.
//
// Exposed via a plain C ABI (loaded with ctypes from
// ml_conformer_generator_tpu/chem/native.py; no pybind11 dependency):
//   * connectivity-by-distance perception (covalent radii + 0.45 A tolerance,
//     mirroring chem/perception.py:23-43);
//   * canonical ranks per the published RDKit algorithm (Schneider/Sayle/
//     Landrum 2015: degree/valence/element/charge/H-count/ring-membership
//     invariants, decreasing-order neighbour refinement, BreakTies),
//     bit-identical to chem/canonical.py::canonical_ranks (both sides rank
//     by plain lexicographic key comparison, no Python hashing);
//   * bounded smallest-ring perception (chem/perception.py:51-106);
//   * a std::thread worker pool for batched canonical ranking — the
//     "standardization/valence worker pool" of the TPU-native design: one
//     call canonicalises a whole generation batch while the TPU runs the
//     next denoising batch.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <set>
#include <thread>
#include <vector>

namespace {

// Covalent radii (Cordero 2008), mirror of chem/periodic.py COVALENT_RADII.
double covalent_radius(int z) {
  switch (z) {
    case 1:  return 0.31;
    case 5:  return 0.84;
    case 6:  return 0.76;
    case 7:  return 0.71;
    case 8:  return 0.66;
    case 9:  return 0.57;
    case 14: return 1.11;
    case 15: return 1.07;
    case 16: return 1.05;
    case 17: return 1.02;
    case 33: return 1.19;
    case 34: return 1.20;
    case 35: return 1.20;
    case 53: return 1.39;
    default: return 1.5;
  }
}

using Key = std::vector<int64_t>;

// Dense ranks from sortable keys; identical semantics to
// chem/canonical.py::_ranks_from_keys: stable sort by key, rank = position at
// which the key's group starts.
std::vector<int64_t> ranks_from_keys(const std::vector<Key>& keys) {
  const size_t n = keys.size();
  std::vector<int32_t> order(n);
  for (size_t i = 0; i < n; ++i) order[i] = static_cast<int32_t>(i);
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return keys[a] < keys[b]; });
  std::vector<int64_t> ranks(n, 0);
  int64_t rank = 0;
  for (size_t pos = 0; pos < n; ++pos) {
    if (pos > 0 && keys[order[pos]] != keys[order[pos - 1]])
      rank = static_cast<int64_t>(pos);
    ranks[order[pos]] = rank;
  }
  return ranks;
}

bool all_distinct(const std::vector<int64_t>& ranks) {
  std::vector<int64_t> s(ranks);
  std::sort(s.begin(), s.end());
  return std::adjacent_find(s.begin(), s.end()) == s.end();
}

// Allowed neutral valences ascending; mirror of periodic.DEFAULT_VALENCES.
const std::vector<int64_t>& default_valences(int z) {
  static const std::vector<int64_t> v1{1}, v2{2}, v246{2, 4, 6}, v3{3},
      v35{3, 5}, v4{4}, v135{1, 3, 5}, none{};
  switch (z) {
    case 1: case 9: case 17: case 35: return v1;
    case 5: case 7: return v3;
    case 6: case 14: return v4;
    case 8: return v2;
    case 15: case 33: return v35;
    case 16: case 34: return v246;
    case 53: return v135;
    default: return none;
  }
}

// Mirror of sanitize._max_valence (charge-adjusted maximum).
int64_t max_valence(int z, int chg) {
  const auto& dv = default_valences(z);
  int64_t base = dv.empty() ? 4 : dv.back();
  if (chg == 0) return base;
  if (z == 7) return chg > 0 ? 4 : 2;
  if (z == 8) return chg > 0 ? 3 : 1;
  if (z == 6) return 3;
  if (z == 16) return 6;
  if ((z == 9 || z == 17 || z == 35 || z == 53) && chg < 0) return 0;
  return base + (chg < 0 ? -chg : chg);
}

// ---------------------------------------------------------------------------
// Kekulé-matching feasibility (mirror of chem/sanitize.py::_aromatic_system,
// _kekule_matching and kekulize_feasible, restricted to what the forced
// aromatic N-H invariant needs).
// ---------------------------------------------------------------------------

// Backtracking matching: every must_match atom gets exactly one double bond.
bool kekule_backtrack(const std::vector<int>& order, size_t idx,
                      const std::vector<std::vector<int>>& adj,
                      std::vector<int>& matched) {
  while (idx < order.size() && matched[order[idx]] != -1) ++idx;
  if (idx == order.size()) return true;
  int a = order[idx];
  for (int b : adj[a]) {
    if (matched[b] == -1) {
      matched[a] = b;
      matched[b] = a;
      if (kekule_backtrack(order, idx + 1, adj, matched)) return true;
      matched[a] = -1;
      matched[b] = -1;
    }
  }
  return false;
}

bool kekule_matching_feasible(int n, const std::vector<int>& atoms,
                              const std::vector<std::vector<int>>& adj,
                              const std::vector<char>& must_match) {
  std::vector<int> matched(n, -1);
  std::vector<int> order;
  for (int a : atoms)
    if (must_match[a]) order.push_back(a);
  std::stable_sort(order.begin(), order.end(), [&](int x, int y) {
    return adj[x].size() < adj[y].size();
  });
  return kekule_backtrack(order, 0, adj, matched);
}

// Build the aromatic matching problem; returns false on the cases where the
// Python builder raises SanitizeError (over-valent / unkekulisable atom).
bool build_aromatic_system(int n, const int32_t* z, const int32_t* charges,
                           int nb, const int32_t* bonds,
                           std::vector<int>& atoms,
                           std::vector<std::vector<int>>& adj,
                           std::vector<char>& must_match) {
  adj.assign(n, {});
  must_match.assign(n, 0);
  std::vector<int64_t> used(n, 0);
  std::vector<char> arom(n, 0);
  for (int k = 0; k < nb; ++k) {
    int i = bonds[3 * k], j = bonds[3 * k + 1], o = bonds[3 * k + 2];
    if (o == 4) {
      adj[i].push_back(j);
      adj[j].push_back(i);
      arom[i] = arom[j] = 1;
    } else {
      used[i] += o;
      used[j] += o;
    }
  }
  atoms.clear();
  std::vector<char> no_double(n, 0);
  bool any_removed = false;
  for (int a = 0; a < n; ++a) {
    if (!arom[a]) continue;
    atoms.push_back(a);
    int chg = charges ? charges[a] : 0;
    int64_t base = used[a] + static_cast<int64_t>(adj[a].size());
    int64_t max_v = max_valence(z[a], chg);
    if (base > max_v) return false;
    bool can_double = base + 1 <= max_v;
    bool lone = (z[a] == 7 || z[a] == 8 || z[a] == 15 || z[a] == 16 ||
                 z[a] == 34 || chg < 0);
    if (!can_double && !lone) return false;
    must_match[a] = lone ? 0 : 1;
    if (!can_double) {
      must_match[a] = 0;
      no_double[a] = 1;
      any_removed = true;
    }
  }
  if (any_removed) {
    for (int a = 0; a < n; ++a) {
      if (no_double[a]) {
        adj[a].clear();
        continue;
      }
      auto& v = adj[a];
      v.erase(std::remove_if(v.begin(), v.end(),
                             [&](int b) { return no_double[b]; }),
              v.end());
    }
  }
  return true;
}

// Mirror of chem/canonical.py::_attached_h_counts' divergence-class-1
// narrowing: aromatic N whose H placement is FORCED by unique kekulizability
// (feasible as lone-pair donor, infeasible as double-bond acceptor) gets one
// extra attached H in the canonical invariant. Kekulization-ambiguous N
// (tautomer pairs: imidazole, purine, 7-azaindole) stay unchanged on both
// sides.
void apply_forced_aromatic_h(int n, const int32_t* z, const int32_t* charges,
                             int nb, const int32_t* bonds,
                             const std::vector<int64_t>& exp_h,
                             std::vector<int64_t>& h) {
  std::vector<int> n_arom(n, 0), deg(n, 0);
  bool any_arom = false;
  for (int k = 0; k < nb; ++k) {
    int i = bonds[3 * k], j = bonds[3 * k + 1], o = bonds[3 * k + 2];
    deg[i]++;
    deg[j]++;
    if (o == 4) {
      n_arom[i]++;
      n_arom[j]++;
      any_arom = true;
    }
  }
  if (!any_arom) return;
  std::vector<int> candidates;
  for (int a = 0; a < n; ++a) {
    int chg = charges ? charges[a] : 0;
    if (z[a] == 7 && chg == 0 && n_arom[a] == 2 && deg[a] == 2 &&
        exp_h[a] == 0)
      candidates.push_back(a);
  }
  if (candidates.empty()) return;
  std::vector<int> atoms;
  std::vector<std::vector<int>> adj;
  std::vector<char> must_match;
  if (!build_aromatic_system(n, z, charges, nb, bonds, atoms, adj,
                             must_match))
    return;  // SanitizeError analog: feasibility false both ways -> no change
  for (int a : candidates) {
    // pyrrole role: a removed from the matching problem entirely
    std::vector<std::vector<int>> adj_u(adj);
    adj_u[a].clear();
    for (auto& v : adj_u)
      v.erase(std::remove(v.begin(), v.end(), a), v.end());
    bool pyrrole_ok = !must_match[a] &&
                      kekule_matching_feasible(n, atoms, adj_u, must_match);
    // pyridine role: a must receive a double bond
    bool pyridine_ok = false;
    if (!adj[a].empty()) {
      std::vector<char> must_m(must_match);
      must_m[a] = 1;
      pyridine_ok = kekule_matching_feasible(n, atoms, adj, must_m);
    }
    if (pyrrole_ok && !pyridine_ok) h[a] += 1;
  }
}

// 1 for atoms on any cycle: iterative bridge finding (Tarjan low-link),
// mirror of chem/canonical.py::_ring_membership_exact.
std::vector<int64_t> ring_membership(int n, int nb, const int32_t* bonds) {
  std::vector<std::vector<std::pair<int32_t, int32_t>>> adj(n);  // (nbr, edge)
  for (int k = 0; k < nb; ++k) {
    int32_t i = bonds[3 * k], j = bonds[3 * k + 1];
    adj[i].push_back({j, k});
    adj[j].push_back({i, k});
  }
  std::vector<int32_t> disc(n, -1), low(n, 0);
  std::vector<int64_t> in_ring(n, 0);
  int32_t timer = 0;
  struct Frame { int32_t a; int32_t pe; size_t cur; };
  for (int root = 0; root < n; ++root) {
    if (disc[root] != -1) continue;
    std::vector<Frame> stack{{root, -1, 0}};
    disc[root] = low[root] = timer++;
    while (!stack.empty()) {
      Frame& f = stack.back();
      if (f.cur < adj[f.a].size()) {
        auto [b, e] = adj[f.a][f.cur++];
        if (e == f.pe) continue;
        if (disc[b] == -1) {
          disc[b] = low[b] = timer++;
          stack.push_back({b, e, 0});
        } else {
          low[f.a] = std::min(low[f.a], disc[b]);
        }
      } else {
        int32_t a = f.a;
        stack.pop_back();
        if (!stack.empty()) {
          int32_t p = stack.back().a;
          low[p] = std::min(low[p], low[a]);
          if (low[a] <= disc[p]) in_ring[a] = in_ring[p] = 1;
        }
      }
    }
  }
  return in_ring;
}

void canonical_ranks_one(int n, const int32_t* z, const int32_t* charges,
                         int nb, const int32_t* bonds, int64_t* out_ranks,
                         int max_iters) {
  if (n == 0) return;
  std::vector<std::vector<std::pair<int32_t, int32_t>>> adj(n);
  std::vector<int64_t> deg(n, 0), v2(n, 0), exp_h(n, 0);
  for (int k = 0; k < nb; ++k) {
    int32_t i = bonds[3 * k], j = bonds[3 * k + 1], o = bonds[3 * k + 2];
    adj[i].push_back({j, o});
    adj[j].push_back({i, o});
    deg[i]++; deg[j]++;
    int64_t w = (o == 4) ? 3 : 2 * o;   // 2x order; aromatic counts 1.5
    v2[i] += w; v2[j] += w;
    if (z[j] == 1) exp_h[i]++;
    if (z[i] == 1) exp_h[j]++;
  }
  std::vector<int64_t> ring = ring_membership(n, nb, bonds);

  // Initial invariants (Schneider/Sayle/Landrum 2015; mirror of
  // chem/canonical.py::_initial_invariants): degree, explicit valence
  // (aromatic 1.5, rounded half up), atomic number, charge, attached-H
  // count (explicit H neighbours + implicit by the valence model), ring
  // membership.
  std::vector<int64_t> h(n, 0);
  for (int a = 0; a < n; ++a) {
    int chg = charges ? charges[a] : 0;
    int64_t vceil = (v2[a] + 1) / 2;
    int64_t target;
    if (chg == 0) {
      const auto& allowed = default_valences(z[a]);
      target = vceil;
      for (int64_t t : allowed)
        if (t >= vceil) { target = t; break; }
    } else {
      target = max_valence(z[a], chg);
    }
    h[a] = exp_h[a] + std::max<int64_t>(0, target - vceil);
  }
  apply_forced_aromatic_h(n, z, charges, nb, bonds, exp_h, h);
  std::vector<Key> keys(n);
  for (int a = 0; a < n; ++a) {
    int chg = charges ? charges[a] : 0;
    keys[a] = {deg[a], (v2[a] + 1) / 2, z[a], chg, h[a], ring[a]};
  }
  std::vector<int64_t> ranks = ranks_from_keys(keys);

  // Refinement key: current rank, then neighbour (bond order, rank) pairs
  // in DECREASING order (the paper's neighbour ordering; mirror of
  // chem/canonical.py::_neighbor_key).
  auto neighbor_keys = [&](const std::vector<int64_t>& r) {
    for (int a = 0; a < n; ++a) {
      std::vector<std::pair<int64_t, int64_t>> neigh;
      neigh.reserve(adj[a].size());
      for (auto& [b, o] : adj[a]) neigh.push_back({o, r[b]});
      std::sort(neigh.begin(), neigh.end(),
                std::greater<std::pair<int64_t, int64_t>>());
      Key k;
      k.reserve(1 + 2 * neigh.size());
      k.push_back(r[a]);
      for (auto& [o, rb] : neigh) { k.push_back(o); k.push_back(rb); }
      keys[a] = std::move(k);
    }
  };

  for (int it = 0; it < max_iters; ++it) {
    neighbor_keys(ranks);
    std::vector<int64_t> nr = ranks_from_keys(keys);
    bool stable = (nr == ranks);
    ranks = std::move(nr);
    if (stable || all_distinct(ranks)) break;
  }

  // BreakTies: split the lowest-ranked tied class by promoting its first
  // member in atom-index order, then re-refine to stability.
  while (!all_distinct(ranks)) {
    std::vector<int> count(n, 0);
    for (int a = 0; a < n; ++a) count[ranks[a]]++;
    int64_t tied = -1;
    for (int r = 0; r < n; ++r)
      if (count[r] > 1) { tied = r; break; }
    int first = -1;
    for (int a = 0; a < n; ++a)
      if (ranks[a] == tied) { first = a; break; }
    for (int a = 0; a < n; ++a)
      keys[a] = {ranks[a], (a == first) ? 0 : 1, 0};
    ranks = ranks_from_keys(keys);
    for (int it = 0; it < max_iters; ++it) {
      neighbor_keys(ranks);
      std::vector<int64_t> nr = ranks_from_keys(keys);
      if (nr == ranks) break;
      ranks = std::move(nr);
    }
  }
  std::memcpy(out_ranks, ranks.data(), sizeof(int64_t) * n);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Connectivity perception (chem/perception.py:23-33 semantics).
// coords: (n, 3) float64. out_pairs: (max_bonds, 2) int32 (i < j).
// Returns number of bonds written, or -1 if max_bonds was too small.
// ---------------------------------------------------------------------------
int chemhost_connectivity(int n, const int32_t* z, const double* coords,
                          double tolerance, int32_t* out_pairs,
                          int max_bonds) {
  std::vector<double> radii(n);
  for (int i = 0; i < n; ++i) radii[i] = covalent_radius(z[i]);
  int nb = 0;
  for (int i = 0; i < n; ++i) {
    for (int j = i + 1; j < n; ++j) {
      double dx = coords[3 * i] - coords[3 * j];
      double dy = coords[3 * i + 1] - coords[3 * j + 1];
      double dz = coords[3 * i + 2] - coords[3 * j + 2];
      double cutoff = radii[i] + radii[j] + tolerance;
      if (dx * dx + dy * dy + dz * dz < cutoff * cutoff) {
        if (nb >= max_bonds) return -1;
        out_pairs[2 * nb] = i;
        out_pairs[2 * nb + 1] = j;
        ++nb;
      }
    }
  }
  return nb;
}

// ---------------------------------------------------------------------------
// Canonical ranks (chem/canonical.py:41-101 semantics, bit-identical).
// bonds: (nb, 3) int32 rows (i, j, order). out_ranks: (n,) int64.
// ---------------------------------------------------------------------------
void chemhost_canonical_ranks(int n, const int32_t* z, const int32_t* charges,
                              int nb, const int32_t* bonds,
                              int64_t* out_ranks) {
  canonical_ranks_one(n, z, charges, nb, bonds, out_ranks, 64);
}

// ---------------------------------------------------------------------------
// Batched canonical ranks over a worker pool. Molecule m occupies atoms
// [atom_off[m], atom_off[m+1]) and bond rows [bond_off[m], bond_off[m+1]);
// bond indices are molecule-local. n_threads <= 0 selects hardware count.
// ---------------------------------------------------------------------------
void chemhost_canonical_ranks_batch(int n_mols, const int32_t* atom_off,
                                    const int32_t* bond_off, const int32_t* z,
                                    const int32_t* charges,
                                    const int32_t* bonds, int64_t* out_ranks,
                                    int n_threads) {
  if (n_threads <= 0) {
    unsigned hw = std::thread::hardware_concurrency();
    n_threads = hw ? static_cast<int>(hw) : 4;
  }
  n_threads = std::min(n_threads, n_mols > 0 ? n_mols : 1);
  auto work = [&](int tid) {
    for (int m = tid; m < n_mols; m += n_threads) {
      int a0 = atom_off[m], a1 = atom_off[m + 1];
      int b0 = bond_off[m], b1 = bond_off[m + 1];
      canonical_ranks_one(a1 - a0, z + a0, charges ? charges + a0 : nullptr,
                          b1 - b0, bonds + 3 * b0, out_ranks + a0, 64);
    }
  };
  if (n_threads == 1) {
    work(0);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Bounded smallest-ring perception (chem/perception.py:51-106 semantics):
// for each bond, the shortest cycle through it (BFS with that edge removed),
// deduplicated by atom set, emitted sorted by ring size.
// out_atoms: flat ring atoms; out_sizes: (max_rings,). Returns ring count,
// or -1 on overflow of either buffer (cap: max_atoms_total = capacity of
// out_atoms assumed max_rings * max_size).
// ---------------------------------------------------------------------------
int chemhost_find_rings(int n, int nb, const int32_t* bonds, int max_size,
                        int32_t* out_atoms, int32_t* out_sizes,
                        int max_rings) {
  std::vector<std::vector<int32_t>> adj(n);
  for (int k = 0; k < nb; ++k) {
    adj[bonds[3 * k]].push_back(bonds[3 * k + 1]);
    adj[bonds[3 * k + 1]].push_back(bonds[3 * k]);
  }
  std::vector<std::vector<int32_t>> rings;
  std::set<std::set<int32_t>> seen;
  for (int k = 0; k < nb; ++k) {
    int32_t src = bonds[3 * k], dst = bonds[3 * k + 1];
    // BFS shortest path src -> dst avoiding edge (src, dst).
    std::vector<int32_t> prev(n, -2);
    prev[src] = -1;
    std::deque<std::pair<int32_t, int>> q{{src, 0}};
    std::vector<int32_t> path;
    while (!q.empty()) {
      auto [v, depth] = q.front();
      q.pop_front();
      if (depth >= max_size - 1) continue;
      for (int32_t w : adj[v]) {
        if ((v == src && w == dst) || (v == dst && w == src)) continue;
        if (prev[w] != -2) continue;
        prev[w] = v;
        if (w == dst) {
          for (int32_t c = w; c != -1; c = prev[c]) path.push_back(c);
          std::reverse(path.begin(), path.end());
          break;
        }
        q.push_back({w, depth + 1});
      }
      if (!path.empty()) break;
    }
    if (path.empty() || static_cast<int>(path.size()) > max_size) continue;
    std::set<int32_t> key(path.begin(), path.end());
    if (seen.insert(key).second) rings.push_back(path);
  }
  std::stable_sort(rings.begin(), rings.end(),
                   [](const auto& a, const auto& b) {
                     return a.size() < b.size();
                   });
  if (static_cast<int>(rings.size()) > max_rings) return -1;
  int atom_pos = 0;
  for (size_t r = 0; r < rings.size(); ++r) {
    out_sizes[r] = static_cast<int32_t>(rings[r].size());
    for (int32_t a : rings[r]) out_atoms[atom_pos++] = a;
  }
  return static_cast<int>(rings.size());
}

// v2: canonical ranks follow the published RDKit algorithm (Schneider/
// Sayle/Landrum 2015 invariants + decreasing-order neighbour refinement).
// v3: attached-H invariant recovers kekulization-forced aromatic N-H
// (divergence class 1 narrowing; mirror of chem/canonical.py).
int chemhost_abi_version() { return 3; }

}  // extern "C"
