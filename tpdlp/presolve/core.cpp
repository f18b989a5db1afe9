// tpdlp presolve core: PaPILO-equivalent LP reductions in C++.
//
// Native counterpart of tpdlp/presolve/reductions.py (kept in lockstep and
// cross-tested against it).  Reference analog: the PaPILO presolve engine
// driven through Packages/papilo_wrapper.cpp:11-50; here the reductions are
// implemented directly on the standard form
//
//     min c'x   s.t.  G x >= h  (rows [0, m_ineq)),  A x = b,  l <= x <= u
//
// Passes, iterated to a fixpoint (bounded by max_passes):
//   1. empty rows        -> drop, or PRIMAL_INFEASIBLE on contradictions
//   2. singleton rows    -> variable bound updates, drop row
//   3. empty columns     -> fix at the cost-optimal bound (DUAL_INFEASIBLE
//                           when that bound is infinite)
//   4. fixed variables   -> substitute into rhs, accumulate obj offset
//   5. dominated columns -> duality fixing at a bound (DUAL_INFEASIBLE when
//                           the forced bound is infinite with strict cost)
//   6. free column singletons in equality rows -> substituted out via the
//                           row (postsolve substitution stack)
//   7. parallel columns  -> proportional columns with consistent costs
//                           merged (postsolve split entry)
//   8. duplicate rows    -> proportional rows merged (tighter rhs for
//                           inequalities; contradiction check for equalities)
//
// Exposed via a C ABI (ctypes); the postsolve transformation (surviving-
// column map, fixed values, objective offset) is primal, matching the
// reference's `postsolve_solution` semantics (papilo_wrapper.cpp:37-45).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <map>
#include <utility>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

enum StatusCode {
  kRunning = 0,
  kSolved = 1,
  kDualInfeasible = 4,
  kPrimalInfeasible = 5,
};

struct Entry {
  int32_t col;
  double val;
};

struct Problem {
  std::vector<std::vector<Entry>> rows;
  std::vector<uint8_t> is_ineq;
  std::vector<double> c, q, l, u;
  std::vector<int64_t> orig_cols;
};

struct Result {
  int status = kRunning;
  Problem p;
  std::vector<int64_t> fixed_idx;
  std::vector<double> fixed_val;
  // Transform stack (CSR-like layout), chronological.  kind 0 = linear
  // substitution (free column singleton); kind 1 = parallel-column split.
  std::vector<int8_t> subst_kind;
  std::vector<int64_t> subst_idx;
  std::vector<double> subst_scale, subst_rhs;
  std::vector<int64_t> subst_indptr{0};
  std::vector<int64_t> subst_cols;
  std::vector<double> subst_vals;
  double obj_offset = 0.0;
  int64_t rows_removed = 0;
  int64_t cols_removed = 0;
  int passes = 0;
};

double feas_tol(const std::vector<double>& q) {
  double mx = 0.0;
  for (double v : q) mx = std::max(mx, std::fabs(v));
  return 1e-9 * (1.0 + mx);
}

// Drop rows flagged in `drop`, preserving order.
void drop_rows(Problem& p, const std::vector<uint8_t>& drop, Result& r) {
  size_t w = 0;
  for (size_t i = 0; i < p.rows.size(); ++i) {
    if (drop[i]) {
      ++r.rows_removed;
      continue;
    }
    if (w != i) {
      p.rows[w] = std::move(p.rows[i]);
      p.is_ineq[w] = p.is_ineq[i];
      p.q[w] = p.q[i];
    }
    ++w;
  }
  p.rows.resize(w);
  p.is_ineq.resize(w);
  p.q.resize(w);
}

bool pass_empty_rows(Problem& p, Result& r) {
  const double tol = feas_tol(p.q);
  std::vector<uint8_t> drop(p.rows.size(), 0);
  bool any = false;
  for (size_t i = 0; i < p.rows.size(); ++i) {
    if (!p.rows[i].empty()) continue;
    const bool bad =
        p.is_ineq[i] ? (p.q[i] > tol) : (std::fabs(p.q[i]) > tol);
    if (bad) {
      r.status = kPrimalInfeasible;
      return false;
    }
    drop[i] = 1;
    any = true;
  }
  if (any) drop_rows(p, drop, r);
  return any;
}

bool pass_singleton_rows(Problem& p, Result& r) {
  std::vector<uint8_t> drop(p.rows.size(), 0);
  bool any = false;
  for (size_t i = 0; i < p.rows.size(); ++i) {
    if (p.rows[i].size() != 1) continue;
    const double a = p.rows[i][0].val;
    const int32_t j = p.rows[i][0].col;
    if (a == 0.0) continue;
    const double v = p.q[i] / a;
    if (p.is_ineq[i]) {
      if (a > 0) {
        p.l[j] = std::max(p.l[j], v);
      } else {
        p.u[j] = std::min(p.u[j], v);
      }
    } else {
      p.l[j] = std::max(p.l[j], v);
      p.u[j] = std::min(p.u[j], v);
    }
    drop[i] = 1;
    any = true;
  }
  for (size_t j = 0; j < p.l.size(); ++j) {
    const double slack =
        std::isfinite(p.u[j]) ? 1e-9 * (1.0 + std::fabs(p.u[j])) : 0.0;
    if (p.l[j] > p.u[j] + slack) {
      r.status = kPrimalInfeasible;
      return false;
    }
  }
  if (any) drop_rows(p, drop, r);
  return any;
}

bool pass_columns(Problem& p, Result& r) {
  const size_t n = p.c.size();
  std::vector<int64_t> col_nnz(n, 0);
  for (const auto& row : p.rows)
    for (const auto& e : row) ++col_nnz[e.col];

  std::vector<uint8_t> fixed(n, 0);
  auto is_fixed = [&](size_t j) {
    return std::isfinite(p.u[j]) &&
           p.l[j] >= p.u[j] - 1e-12 * (1.0 + std::fabs(p.u[j]));
  };
  for (size_t j = 0; j < n; ++j) fixed[j] = is_fixed(j);

  // Empty columns: fix at the cost-optimal bound.
  for (size_t j = 0; j < n; ++j) {
    if (col_nnz[j] != 0 || fixed[j]) continue;
    double v;
    if (p.c[j] > 0) {
      if (std::isinf(p.l[j])) {
        r.status = kDualInfeasible;
        return false;
      }
      v = p.l[j];
    } else if (p.c[j] < 0) {
      if (std::isinf(p.u[j])) {
        r.status = kDualInfeasible;
        return false;
      }
      v = p.u[j];
    } else {
      v = std::isfinite(p.l[j]) ? p.l[j]
                                : (std::isfinite(p.u[j]) ? p.u[j] : 0.0);
    }
    p.l[j] = p.u[j] = v;
    fixed[j] = 1;
  }

  bool any = false;
  for (size_t j = 0; j < n; ++j) any |= (fixed[j] != 0);
  if (!any) return false;

  // Substitute fixed variables into the rhs and compact columns.
  std::vector<double> val(n, 0.0);
  std::vector<int32_t> new_col(n, -1);
  int32_t w = 0;
  for (size_t j = 0; j < n; ++j) {
    if (fixed[j]) {
      val[j] = 0.5 * (p.l[j] + p.u[j]);
      r.fixed_idx.push_back(p.orig_cols[j]);
      r.fixed_val.push_back(val[j]);
      r.obj_offset += p.c[j] * val[j];
      ++r.cols_removed;
    } else {
      new_col[j] = w++;
    }
  }
  for (size_t i = 0; i < p.rows.size(); ++i) {
    auto& row = p.rows[i];
    size_t k = 0;
    for (size_t e = 0; e < row.size(); ++e) {
      const int32_t j = row[e].col;
      if (fixed[j]) {
        p.q[i] -= row[e].val * val[j];
      } else {
        row[k].col = new_col[j];
        row[k].val = row[e].val;
        ++k;
      }
    }
    row.resize(k);
  }
  std::vector<double> c2, l2, u2;
  std::vector<int64_t> oc2;
  c2.reserve(w);
  for (size_t j = 0; j < n; ++j) {
    if (fixed[j]) continue;
    c2.push_back(p.c[j]);
    l2.push_back(p.l[j]);
    u2.push_back(p.u[j]);
    oc2.push_back(p.orig_cols[j]);
  }
  p.c = std::move(c2);
  p.l = std::move(l2);
  p.u = std::move(u2);
  p.orig_cols = std::move(oc2);
  return true;
}

// Dominated columns (duality fixing; PaPILO's DualFix).  A column with no
// equality-row entries whose inequality entries all share one sign admits a
// one-sided dual bound: with rows G x >= h (dual y >= 0) the reduced cost
// lambda_j = c_j - sum_i a_ij y_i is >= c_j when all a_ij <= 0, so c_j >= 0
// forces x_j to its lower bound; symmetrically c_j <= 0 with all a_ij >= 0
// forces the upper bound.  An infinite forced bound with strict cost sign
// certifies dual infeasibility.  The bound pinch (l == u) is applied here;
// pass_columns performs the substitution.
bool pass_dominated_cols(Problem& p, Result& r) {
  const size_t n = p.c.size();
  std::vector<uint8_t> has_eq(n, 0), pos_ineq(n, 0), neg_ineq(n, 0),
      nonempty(n, 0);
  for (size_t i = 0; i < p.rows.size(); ++i) {
    for (const auto& e : p.rows[i]) {
      nonempty[e.col] = 1;
      if (!p.is_ineq[i]) {
        has_eq[e.col] = 1;
      } else if (e.val > 0) {
        pos_ineq[e.col] = 1;
      } else if (e.val < 0) {
        neg_ineq[e.col] = 1;
      }
    }
  }
  bool any = false;
  for (size_t j = 0; j < n; ++j) {
    if (!nonempty[j] || has_eq[j] || !(p.l[j] < p.u[j])) continue;
    const bool lo = !pos_ineq[j] && p.c[j] >= 0;
    const bool hi = !neg_ineq[j] && p.c[j] <= 0;
    if (lo) {
      if (std::isfinite(p.l[j])) {
        p.u[j] = p.l[j];
        any = true;
      } else if (p.c[j] > 0) {
        r.status = kDualInfeasible;
        return false;
      }
    } else if (hi) {
      if (std::isfinite(p.u[j])) {
        p.l[j] = p.u[j];
        any = true;
      } else if (p.c[j] < 0) {
        r.status = kDualInfeasible;
        return false;
      }
    }
  }
  return any;
}

// Free column singletons in equality rows: a free variable (l = -inf,
// u = +inf) with a single nonzero a_ij in an equality row is determined by
// that row: x_j = (b_i - sum_k a_ik x_k)/a_ij.  Remove row i and column j,
// fold c_j through the row into the remaining costs, and push the
// substitution onto the postsolve stack (PaPILO's column-singleton family).
bool pass_free_singleton_cols(Problem& p, Result& r) {
  const size_t n = p.c.size();
  const size_t m = p.rows.size();
  std::vector<int64_t> col_nnz(n, 0);
  std::vector<int64_t> col_row(n, -1);
  std::vector<double> col_val(n, 0.0);
  for (size_t i = 0; i < m; ++i) {
    for (const auto& e : p.rows[i]) {
      ++col_nnz[e.col];
      col_row[e.col] = static_cast<int64_t>(i);
      col_val[e.col] = e.val;
    }
  }
  std::vector<uint8_t> row_used(m, 0), drop_row(m, 0), drop_col(n, 0);
  bool any = false;
  for (size_t j = 0; j < n; ++j) {
    if (col_nnz[j] != 1) continue;
    if (!(std::isinf(p.l[j]) && p.l[j] < 0)) continue;
    if (!(std::isinf(p.u[j]) && p.u[j] > 0)) continue;
    const int64_t i = col_row[j];
    if (p.is_ineq[i] || row_used[i]) continue;
    const double a_jj = col_val[j];
    double vmax = 0.0;
    for (const auto& e : p.rows[i]) vmax = std::max(vmax, std::fabs(e.val));
    if (std::fabs(a_jj) < 1e-10 * (1.0 + vmax)) continue;  // unsafe pivot
    const double ratio = p.c[j] / a_jj;
    r.subst_kind.push_back(0);
    r.subst_idx.push_back(p.orig_cols[j]);
    r.subst_scale.push_back(a_jj);
    r.subst_rhs.push_back(p.q[i]);
    for (const auto& e : p.rows[i]) {
      if (e.col == static_cast<int32_t>(j)) continue;
      p.c[e.col] -= ratio * e.val;
      r.subst_cols.push_back(p.orig_cols[e.col]);
      r.subst_vals.push_back(e.val);
    }
    r.subst_indptr.push_back(static_cast<int64_t>(r.subst_cols.size()));
    r.obj_offset += ratio * p.q[i];
    row_used[i] = 1;
    drop_row[i] = 1;
    drop_col[j] = 1;
    any = true;
  }
  if (!any) return false;
  drop_rows(p, drop_row, r);
  // Compact columns (dropped columns have no surviving entries: their only
  // row was just removed) and remap indices in the remaining rows.
  std::vector<int32_t> new_col(n, -1);
  int32_t w = 0;
  for (size_t j = 0; j < n; ++j) {
    if (drop_col[j]) {
      ++r.cols_removed;
    } else {
      new_col[j] = w++;
    }
  }
  for (auto& row : p.rows)
    for (auto& e : row) e.col = new_col[e.col];
  std::vector<double> c2, l2, u2;
  std::vector<int64_t> oc2;
  c2.reserve(w);
  for (size_t j = 0; j < n; ++j) {
    if (drop_col[j]) continue;
    c2.push_back(p.c[j]);
    l2.push_back(p.l[j]);
    u2.push_back(p.u[j]);
    oc2.push_back(p.orig_cols[j]);
  }
  p.c = std::move(c2);
  p.l = std::move(l2);
  p.u = std::move(u2);
  p.orig_cols = std::move(oc2);
  return true;
}

// Parallel (proportional) columns (PaPILO ParallelCols): col_j = lam *
// col_j0 with consistent costs (c_j = lam c_j0) merge into one variable
// w = x_j0 + lam x_j with summed bounds; the postsolve kind-1 entry splits
// w back into a feasible pair.  Skipped when the split formula would be
// ill-defined under infinite bounds.  Mirrors the Python pass exactly
// (ascending kept-column order, same tolerances).
bool pass_parallel_cols(Problem& p, Result& r) {
  const size_t n = p.c.size();
  // Column views built by scanning rows in order => ascending row index,
  // matching scipy CSC entry order.
  std::vector<std::vector<int64_t>> col_rows(n);
  std::vector<std::vector<double>> col_vals(n);
  for (size_t i = 0; i < p.rows.size(); ++i) {
    for (const auto& e : p.rows[i]) {
      col_rows[e.col].push_back(static_cast<int64_t>(i));
      col_vals[e.col].push_back(e.val);
    }
  }
  // Hash by row PATTERN only; candidates in a bucket are compared by
  // value with a relative tolerance (mirrors the Python pass; exact
  // bit-keys miss pairs whose proportionality factor rounds).
  using Key = std::vector<int64_t>;
  struct Cand {
    size_t j;
    double lead;
    std::vector<double> norm;
  };
  std::map<Key, std::vector<Cand>> sig;
  std::vector<uint8_t> drop(n, 0);
  bool any = false;
  for (size_t j = 0; j < n; ++j) {
    if (col_rows[j].empty()) continue;  // empty columns: own pass
    const double lead = col_vals[j][0];
    std::vector<double> norm(col_vals[j].size());
    for (size_t e = 0; e < col_vals[j].size(); ++e)
      norm[e] = col_vals[j][e] / lead;
    Key key(col_rows[j].begin(), col_rows[j].end());
    auto& bucket = sig[key];
    const Cand* hit = nullptr;
    for (const auto& cand : bucket) {
      bool close = true;
      for (size_t e = 0; e < norm.size() && close; ++e) {
        close = std::fabs(norm[e] - cand.norm[e]) <=
                1e-12 * std::fabs(cand.norm[e]);
      }
      if (close) {
        hit = &cand;
        break;
      }
    }
    if (hit == nullptr) {
      bucket.push_back({j, lead, std::move(norm)});
      continue;
    }
    const size_t j0 = hit->j;
    const double lam = lead / hit->lead;  // col_j = lam * col_j0
    if (std::fabs(p.c[j] - lam * p.c[j0]) >
        1e-12 * (1.0 + std::fabs(p.c[j]))) {
      continue;
    }
    const bool ok =
        std::isfinite(p.u[j0]) || (lam > 0 && std::isfinite(p.l[j])) ||
        (lam < 0 && std::isfinite(p.u[j]));
    if (!ok) continue;
    r.subst_kind.push_back(1);
    r.subst_idx.push_back(p.orig_cols[j]);
    r.subst_scale.push_back(lam);
    r.subst_rhs.push_back(p.u[j0]);
    r.subst_cols.push_back(p.orig_cols[j0]);
    r.subst_cols.push_back(p.orig_cols[j0]);
    r.subst_vals.push_back(p.l[j]);
    r.subst_vals.push_back(p.u[j]);
    r.subst_indptr.push_back(static_cast<int64_t>(r.subst_cols.size()));
    if (lam > 0) {
      p.l[j0] = p.l[j0] + lam * p.l[j];
      p.u[j0] = p.u[j0] + lam * p.u[j];
    } else {
      p.l[j0] = p.l[j0] + lam * p.u[j];
      p.u[j0] = p.u[j0] + lam * p.l[j];
    }
    drop[j] = 1;
    any = true;
  }
  if (!any) return false;
  // Compact dropped columns and remap indices (dropped columns' entries
  // are removed from the rows).
  std::vector<int32_t> new_col(n, -1);
  int32_t w = 0;
  for (size_t j = 0; j < n; ++j) {
    if (drop[j]) {
      ++r.cols_removed;
    } else {
      new_col[j] = w++;
    }
  }
  for (auto& row : p.rows) {
    size_t k = 0;
    for (size_t e = 0; e < row.size(); ++e) {
      if (drop[row[e].col]) continue;
      row[k].col = new_col[row[e].col];
      row[k].val = row[e].val;
      ++k;
    }
    row.resize(k);
  }
  std::vector<double> c2, l2, u2;
  std::vector<int64_t> oc2;
  c2.reserve(w);
  for (size_t j = 0; j < n; ++j) {
    if (drop[j]) continue;
    c2.push_back(p.c[j]);
    l2.push_back(p.l[j]);
    u2.push_back(p.u[j]);
    oc2.push_back(p.orig_cols[j]);
  }
  p.c = std::move(c2);
  p.l = std::move(l2);
  p.u = std::move(u2);
  p.orig_cols = std::move(oc2);
  return true;
}

bool pass_duplicate_rows(Problem& p, Result& r) {
  const double tol = feas_tol(p.q);
  // Signature: column pattern + values normalised by the leading nonzero.
  using Key = std::vector<int64_t>;
  std::map<Key, std::pair<size_t, double>> sig;
  std::vector<uint8_t> drop(p.rows.size(), 0);
  bool any = false;
  for (size_t i = 0; i < p.rows.size(); ++i) {
    if (p.rows[i].empty()) continue;
    const double lead = p.rows[i][0].val;
    Key key;
    key.reserve(2 * p.rows[i].size());
    for (const auto& e : p.rows[i]) {
      key.push_back(e.col);
      double nv = e.val / lead;
      int64_t bits;
      std::memcpy(&bits, &nv, sizeof(bits));
      key.push_back(bits);
    }
    auto it = sig.find(key);
    if (it == sig.end()) {
      sig.emplace(std::move(key), std::make_pair(i, lead));
      continue;
    }
    const size_t i0 = it->second.first;
    const double lam = lead / it->second.second;  // row_i = lam * row_i0
    if (p.is_ineq[i] && p.is_ineq[i0] && lam > 0) {
      p.q[i0] = std::max(p.q[i0], p.q[i] / lam);
      drop[i] = 1;
      any = true;
    } else if (!p.is_ineq[i] && !p.is_ineq[i0]) {
      if (std::fabs(p.q[i] / lam - p.q[i0]) > tol) {
        r.status = kPrimalInfeasible;
        return false;
      }
      drop[i] = 1;
      any = true;
    }
  }
  if (any) drop_rows(p, drop, r);
  return any;
}

}  // namespace

extern "C" {

void* tpdlp_presolve_run(
    int64_t m, int64_t n, int64_t m_ineq,
    const int64_t* indptr, const int32_t* indices, const double* data,
    const double* c, const double* q, const double* l, const double* u,
    int max_passes) {
  auto* res = new Result();
  Problem& p = res->p;
  p.rows.resize(m);
  for (int64_t i = 0; i < m; ++i) {
    p.rows[i].reserve(indptr[i + 1] - indptr[i]);
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e) {
      if (data[e] != 0.0) p.rows[i].push_back({indices[e], data[e]});
    }
  }
  p.is_ineq.resize(m);
  for (int64_t i = 0; i < m; ++i) p.is_ineq[i] = i < m_ineq;
  p.c.assign(c, c + n);
  p.q.assign(q, q + m);
  p.l.assign(l, l + n);
  p.u.assign(u, u + n);
  p.orig_cols.resize(n);
  for (int64_t j = 0; j < n; ++j) p.orig_cols[j] = j;

  bool changed = true;
  while (changed && res->passes < max_passes && res->status == kRunning) {
    changed = false;
    ++res->passes;
    if (pass_empty_rows(p, *res)) { changed = true; continue; }
    if (res->status != kRunning) break;
    if (pass_singleton_rows(p, *res)) { changed = true; continue; }
    if (res->status != kRunning) break;
    if (pass_columns(p, *res)) { changed = true; continue; }
    if (res->status != kRunning) break;
    if (pass_dominated_cols(p, *res)) { changed = true; continue; }
    if (res->status != kRunning) break;
    if (pass_free_singleton_cols(p, *res)) { changed = true; continue; }
    if (pass_parallel_cols(p, *res)) { changed = true; continue; }
    if (pass_duplicate_rows(p, *res)) changed = true;
  }

  if (res->status == kRunning && p.c.empty() && p.rows.empty()) {
    res->status = kSolved;
  }
  return res;
}

int tpdlp_status(void* h) { return static_cast<Result*>(h)->status; }
int64_t tpdlp_reduced_m(void* h) {
  return static_cast<Result*>(h)->p.rows.size();
}
int64_t tpdlp_reduced_n(void* h) {
  return static_cast<Result*>(h)->p.c.size();
}
int64_t tpdlp_reduced_m_ineq(void* h) {
  const auto& p = static_cast<Result*>(h)->p;
  int64_t k = 0;
  for (auto b : p.is_ineq) k += (b != 0);
  return k;
}
int64_t tpdlp_reduced_nnz(void* h) {
  const auto& p = static_cast<Result*>(h)->p;
  int64_t k = 0;
  for (const auto& row : p.rows) k += row.size();
  return k;
}
int64_t tpdlp_n_fixed(void* h) {
  return static_cast<Result*>(h)->fixed_idx.size();
}
int64_t tpdlp_rows_removed(void* h) {
  return static_cast<Result*>(h)->rows_removed;
}
int64_t tpdlp_cols_removed(void* h) {
  return static_cast<Result*>(h)->cols_removed;
}
int tpdlp_passes(void* h) { return static_cast<Result*>(h)->passes; }
double tpdlp_obj_offset(void* h) {
  return static_cast<Result*>(h)->obj_offset;
}

// Copy the reduced problem out with inequality rows re-packed as a prefix.
void tpdlp_get_reduced(void* h, int64_t* indptr, int32_t* indices,
                       double* data, double* c, double* q, double* l,
                       double* u) {
  const auto& p = static_cast<Result*>(h)->p;
  const size_t m = p.rows.size();
  std::vector<size_t> order;
  order.reserve(m);
  for (size_t i = 0; i < m; ++i)
    if (p.is_ineq[i]) order.push_back(i);
  for (size_t i = 0; i < m; ++i)
    if (!p.is_ineq[i]) order.push_back(i);

  int64_t e = 0;
  indptr[0] = 0;
  for (size_t oi = 0; oi < m; ++oi) {
    const auto& row = p.rows[order[oi]];
    for (const auto& ent : row) {
      indices[e] = ent.col;
      data[e] = ent.val;
      ++e;
    }
    indptr[oi + 1] = e;
    q[oi] = p.q[order[oi]];
  }
  std::memcpy(c, p.c.data(), p.c.size() * sizeof(double));
  std::memcpy(l, p.l.data(), p.l.size() * sizeof(double));
  std::memcpy(u, p.u.data(), p.u.size() * sizeof(double));
}

void tpdlp_get_postsolve(void* h, int64_t* col_map, int64_t* fixed_idx,
                         double* fixed_val) {
  const auto* r = static_cast<Result*>(h);
  std::memcpy(col_map, r->p.orig_cols.data(),
              r->p.orig_cols.size() * sizeof(int64_t));
  std::memcpy(fixed_idx, r->fixed_idx.data(),
              r->fixed_idx.size() * sizeof(int64_t));
  std::memcpy(fixed_val, r->fixed_val.data(),
              r->fixed_val.size() * sizeof(double));
}

int64_t tpdlp_n_subst(void* h) {
  return static_cast<Result*>(h)->subst_idx.size();
}
int64_t tpdlp_subst_nnz(void* h) {
  return static_cast<Result*>(h)->subst_cols.size();
}
void tpdlp_get_subst(void* h, int64_t* idx, double* scale, double* rhs,
                     int64_t* indptr, int64_t* cols, double* vals,
                     int8_t* kind) {
  const auto* r = static_cast<Result*>(h);
  std::memcpy(idx, r->subst_idx.data(),
              r->subst_idx.size() * sizeof(int64_t));
  std::memcpy(scale, r->subst_scale.data(),
              r->subst_scale.size() * sizeof(double));
  std::memcpy(rhs, r->subst_rhs.data(),
              r->subst_rhs.size() * sizeof(double));
  std::memcpy(indptr, r->subst_indptr.data(),
              r->subst_indptr.size() * sizeof(int64_t));
  std::memcpy(cols, r->subst_cols.data(),
              r->subst_cols.size() * sizeof(int64_t));
  std::memcpy(vals, r->subst_vals.data(),
              r->subst_vals.size() * sizeof(double));
  std::memcpy(kind, r->subst_kind.data(),
              r->subst_kind.size() * sizeof(int8_t));
}

void tpdlp_free(void* h) { delete static_cast<Result*>(h); }

}  // extern "C"
