// Native histogram gradient-boosted trees (regression, L2) with LightGBM
// training semantics, replacing the reference's lgb.train dependency
// (reference src/steps/sklearn/models.py:69-99, src/pipeline_config.py:136-148).
//
// Semantics reproduced from LightGBM's gbdt/regression_l2 configuration:
//  - boost from average (initial score = mean(y)); grad = pred - y, hess = 1
//  - equal-count quantile binning, max_bin buckets, bin-boundary thresholds
//  - LEAF-WISE (best-first) growth to num_leaves, constrained by max_depth,
//    min_data_in_leaf ('min_data'), min_sum_hessian_in_leaf, lambda_l2
//  - split gain  GL^2/(HL+l2) + GR^2/(HR+l2) - G^2/(H+l2)
//  - sibling histogram by subtraction (parent - built child)
//  - shrinkage by learning_rate; early stopping on an EXPLICIT valid set
//    (l2 metric) with early_stopping_rounds patience; predict at
//    best_iteration
//  - optional feature_fraction ('sub_feature') column sampling per tree
//
// Exposed as a C ABI for ctypes (mapping_tpu/utils/native_gbm.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <random>
#include <vector>

namespace {

struct Node {
  int feature = -1;       // -1: leaf
  double threshold = 0.0; // go left if x <= threshold (NaN goes left)
  int left = -1;
  int right = -1;
  double value = 0.0;     // leaf output (already shrunk by learning_rate)
};

struct Tree {
  std::vector<Node> nodes;

  double predict_row(const double* x) const {
    int i = 0;
    while (nodes[i].feature >= 0) {
      double v = x[nodes[i].feature];
      i = (!(v > nodes[i].threshold)) ? nodes[i].left : nodes[i].right;
    }
    return nodes[i].value;
  }
};

struct Model {
  double init_score = 0.0;
  int num_features = 0;
  int best_iteration = 0; // 1-based count of trees to use by default
  std::vector<Tree> trees;
};

// ---------------------------------------------------------------- binning

struct BinMapper {
  // uppers[f][b] = inclusive upper value of bin b for feature f; the split
  // threshold between bins b and b+1 is uppers[f][b].
  std::vector<std::vector<double>> uppers;

  int bin(int f, double v) const {
    const auto& u = uppers[f];
    // first bin whose inclusive upper >= v  (NaN -> bin 0)
    if (std::isnan(v)) return 0;
    return (int)(std::lower_bound(u.begin(), u.end() - 1, v) - u.begin());
  }
};

BinMapper make_bins(const double* X, long n, int d, int max_bin) {
  BinMapper m;
  m.uppers.resize(d);
  std::vector<double> col(n);
  for (int f = 0; f < d; ++f) {
    // drop NaNs before sorting: NaN comparisons violate strict weak
    // ordering (std::sort UB), and bin() already routes NaN to bin 0 at
    // lookup time — NaN must never become a bin boundary
    long cn = 0;
    for (long i = 0; i < n; ++i) {
      double v = X[i * d + f];
      if (!std::isnan(v)) col[cn++] = v;
    }
    std::sort(col.begin(), col.begin() + cn);
    // distinct values
    std::vector<double> vals;
    std::vector<long> cnts;
    for (long i = 0; i < cn; ++i) {
      if (vals.empty() || col[i] != vals.back()) {
        vals.push_back(col[i]);
        cnts.push_back(1);
      } else {
        ++cnts.back();
      }
    }
    auto& u = m.uppers[f];
    if ((long)vals.size() <= max_bin) {
      u = vals;
    } else {
      // greedy equal-count: close a bin once it holds >= n/max_bin samples
      double per = (double)cn / max_bin;
      double acc = 0.0;
      for (size_t k = 0; k < vals.size(); ++k) {
        acc += cnts[k];
        if (acc >= per * (u.size() + 1) &&
            (long)u.size() < max_bin - 1)
          u.push_back(vals[k]);
      }
      u.push_back(vals.back());
    }
    if (u.empty()) u.push_back(0.0);
  }
  return m;
}

// --------------------------------------------------------------- training

struct LeafInfo {
  int node = 0;           // index into tree.nodes
  long begin = 0, end = 0; // range in the index partition
  int depth = 0;
  double sum_grad = 0.0;
  long count = 0;
  // best split found for this leaf
  double gain = -1.0;
  int feature = -1;
  int split_bin = -1;
  double left_grad = 0.0;
  long left_count = 0;
  std::vector<double> hist_grad;  // d * max_bin
  std::vector<long> hist_cnt;
};

struct TrainCtx {
  long n;
  int d;
  int max_bin;
  int num_leaves;
  int max_depth;
  long min_data;
  double min_sum_hessian;
  double lambda_l2;
  const BinMapper* bins;
  const uint8_t* binned;  // column-major: binned[f * n + i]
  const std::vector<int>* features; // sampled feature subset
};

void build_hist(const TrainCtx& c, const long* idx, long begin, long end,
                const double* grad, std::vector<double>& hg,
                std::vector<long>& hc) {
  hg.assign((size_t)c.d * c.max_bin, 0.0);
  hc.assign((size_t)c.d * c.max_bin, 0);
  for (int f : *c.features) {
    const uint8_t* col = c.binned + (size_t)f * c.n;
    double* hgf = hg.data() + (size_t)f * c.max_bin;
    long* hcf = hc.data() + (size_t)f * c.max_bin;
    for (long k = begin; k < end; ++k) {
      long i = idx[k];
      hgf[col[i]] += grad[i];
      ++hcf[col[i]];
    }
  }
}

void find_best_split(const TrainCtx& c, LeafInfo& leaf) {
  leaf.gain = -1.0;
  const double G = leaf.sum_grad;
  const double H = (double)leaf.count; // hess = 1
  const double parent = G * G / (H + c.lambda_l2);
  for (int f : *c.features) {
    const double* hg = leaf.hist_grad.data() + (size_t)f * c.max_bin;
    const long* hc = leaf.hist_cnt.data() + (size_t)f * c.max_bin;
    int nb = (int)(*c.bins).uppers[f].size();
    double gl = 0.0;
    long nl = 0;
    for (int b = 0; b < nb - 1; ++b) { // last bin can't be a left boundary
      gl += hg[b];
      nl += hc[b];
      long nr = leaf.count - nl;
      if (nl < c.min_data || (double)nl < c.min_sum_hessian) continue;
      if (nr < c.min_data || (double)nr < c.min_sum_hessian) break;
      double gr = G - gl;
      double gain = gl * gl / ((double)nl + c.lambda_l2) +
                    gr * gr / ((double)nr + c.lambda_l2) - parent;
      if (gain > leaf.gain) {
        leaf.gain = gain;
        leaf.feature = f;
        leaf.split_bin = b;
        leaf.left_grad = gl;
        leaf.left_count = nl;
      }
    }
  }
}

Tree grow_tree(const TrainCtx& c, long* idx, const double* grad,
               double learning_rate, double* train_update) {
  Tree tree;
  tree.nodes.emplace_back();
  std::vector<LeafInfo> leaves;
  {
    LeafInfo root;
    root.node = 0;
    root.begin = 0;
    root.end = c.n;
    root.depth = 0;
    root.count = c.n;
    for (long i = 0; i < c.n; ++i) root.sum_grad += grad[i];
    build_hist(c, idx, 0, c.n, grad, root.hist_grad, root.hist_cnt);
    find_best_split(c, root);
    leaves.push_back(std::move(root));
  }

  int n_leaves = 1;
  while (n_leaves < c.num_leaves) {
    // pick the splittable leaf with max gain (LightGBM leaf-wise policy)
    int best = -1;
    for (size_t k = 0; k < leaves.size(); ++k) {
      const LeafInfo& L = leaves[k];
      if (L.feature < 0 || L.gain <= 0.0) continue;
      if (c.max_depth > 0 && L.depth >= c.max_depth) continue;
      if (best < 0 || L.gain > leaves[best].gain) best = (int)k;
    }
    if (best < 0) break;

    LeafInfo L = std::move(leaves[best]);
    leaves.erase(leaves.begin() + best);

    // partition indices: x <= threshold-bin goes left
    const uint8_t* col = c.binned + (size_t)L.feature * c.n;
    long mid = L.begin;
    for (long k = L.begin, last = L.end - 1; k <= last;) {
      if (col[idx[k]] <= L.split_bin) {
        std::swap(idx[k], idx[mid]);
        ++mid;
        ++k;
      } else {
        std::swap(idx[k], idx[last]);
        --last;
      }
    }

    // materialize the split in the tree (emplace_back may reallocate, so
    // never hold a Node reference across it)
    int left_node = (int)tree.nodes.size();
    int right_node = left_node + 1;
    tree.nodes.emplace_back();
    tree.nodes.emplace_back();
    tree.nodes[L.node].feature = L.feature;
    tree.nodes[L.node].threshold = (*c.bins).uppers[L.feature][L.split_bin];
    tree.nodes[L.node].left = left_node;
    tree.nodes[L.node].right = right_node;

    LeafInfo lc, rc;
    lc.node = left_node;
    lc.begin = L.begin;
    lc.end = mid;
    lc.depth = L.depth + 1;
    lc.sum_grad = L.left_grad;
    lc.count = L.left_count;
    rc.node = right_node;
    rc.begin = mid;
    rc.end = L.end;
    rc.depth = L.depth + 1;
    rc.sum_grad = L.sum_grad - L.left_grad;
    rc.count = L.count - L.left_count;

    // build the smaller child's histogram, derive the sibling by subtraction
    LeafInfo* small = (lc.count <= rc.count) ? &lc : &rc;
    LeafInfo* big = (small == &lc) ? &rc : &lc;
    build_hist(c, idx, small->begin, small->end, grad, small->hist_grad,
               small->hist_cnt);
    big->hist_grad.resize(L.hist_grad.size());
    big->hist_cnt.resize(L.hist_cnt.size());
    for (size_t t = 0; t < L.hist_grad.size(); ++t) {
      big->hist_grad[t] = L.hist_grad[t] - small->hist_grad[t];
      big->hist_cnt[t] = L.hist_cnt[t] - small->hist_cnt[t];
    }
    find_best_split(c, lc);
    find_best_split(c, rc);
    leaves.push_back(std::move(lc));
    leaves.push_back(std::move(rc));
    ++n_leaves;
  }

  // leaf outputs: -G/(H + l2), shrunk; update train predictions in place
  for (const LeafInfo& L : leaves) {
    double v = -L.sum_grad / ((double)L.count + c.lambda_l2) * learning_rate;
    tree.nodes[L.node].value = v;
    for (long k = L.begin; k < L.end; ++k) train_update[idx[k]] += v;
  }
  return tree;
}

}  // namespace

extern "C" {

void* gbm_train(const double* X, const double* y, long n, int d,
                const double* Xv, const double* yv, long nv,
                int num_leaves, int max_depth, long min_data,
                double learning_rate, double lambda_l2,
                double min_sum_hessian, int max_bin, int num_rounds,
                int early_stopping_rounds, double feature_fraction,
                unsigned seed) {
  if (n <= 0 || d <= 0) return nullptr;
  // bin ids are stored in uint8: a caller-supplied max_bin > 256 would
  // silently wrap and corrupt histogram splits
  max_bin = std::max(2, std::min(max_bin, 256));
  Model* m = new Model();
  m->num_features = d;
  double mean = 0.0;
  for (long i = 0; i < n; ++i) mean += y[i];
  mean /= (double)n;
  m->init_score = mean;

  BinMapper bins = make_bins(X, n, d, max_bin);
  std::vector<uint8_t> binned((size_t)d * n);
  for (int f = 0; f < d; ++f)
    for (long i = 0; i < n; ++i)
      binned[(size_t)f * n + i] = (uint8_t)bins.bin(f, X[i * d + f]);

  std::vector<double> pred(n, mean), grad(n);
  std::vector<double> vpred(nv, mean);
  std::vector<long> idx(n);
  std::vector<int> all_features(d);
  for (int f = 0; f < d; ++f) all_features[f] = f;
  std::mt19937 rng(seed);

  TrainCtx c;
  c.n = n;
  c.d = d;
  c.max_bin = max_bin;
  c.num_leaves = std::max(2, num_leaves);
  c.max_depth = max_depth;
  c.min_data = std::max(1L, min_data);
  c.min_sum_hessian = min_sum_hessian;
  c.lambda_l2 = lambda_l2;
  c.bins = &bins;
  c.binned = binned.data();

  double best_loss = std::numeric_limits<double>::infinity();
  int best_iter = 0;
  int n_sample = std::max(1, (int)std::round(feature_fraction * d));

  for (int round = 0; round < num_rounds; ++round) {
    for (long i = 0; i < n; ++i) grad[i] = pred[i] - y[i];
    for (long i = 0; i < n; ++i) idx[i] = i;

    std::vector<int> feats = all_features;
    if (n_sample < d) {
      std::shuffle(feats.begin(), feats.end(), rng);
      feats.resize(n_sample);
      std::sort(feats.begin(), feats.end());
    }
    c.features = &feats;

    Tree tree = grow_tree(c, idx.data(), grad.data(), learning_rate,
                          pred.data());
    m->trees.push_back(std::move(tree));

    if (nv > 0) {
      double loss = 0.0;
      for (long i = 0; i < nv; ++i) {
        vpred[i] += m->trees.back().predict_row(Xv + i * d);
        double e = vpred[i] - yv[i];
        loss += e * e;
      }
      loss /= (double)nv;
      if (loss < best_loss - 1e-15) {
        best_loss = loss;
        best_iter = round + 1;
      } else if (early_stopping_rounds > 0 &&
                 round + 1 - best_iter >= early_stopping_rounds) {
        break;
      }
    } else {
      best_iter = round + 1;
    }
  }
  m->best_iteration = std::max(1, best_iter);
  return m;
}

int gbm_best_iteration(void* model) {
  return ((Model*)model)->best_iteration;
}

int gbm_num_trees(void* model) { return (int)((Model*)model)->trees.size(); }

int gbm_num_features(void* model) { return ((Model*)model)->num_features; }

void gbm_predict(void* model, const double* X, long n, int d,
                 int num_iteration, double* out) {
  Model* m = (Model*)model;
  int nt = (int)m->trees.size();
  if (num_iteration > 0 && num_iteration < nt) nt = num_iteration;
  for (long i = 0; i < n; ++i) {
    double s = m->init_score;
    for (int t = 0; t < nt; ++t) s += m->trees[t].predict_row(X + i * d);
    out[i] = s;
  }
}

// serialization: [init_score, num_features, best_iteration, n_trees,
//                 per tree: n_nodes, nodes...]
long gbm_serialize(void* model, char* buf, long cap) {
  Model* m = (Model*)model;
  long need = sizeof(double) + 3 * sizeof(int32_t);
  for (const Tree& t : m->trees)
    need += sizeof(int32_t) +
            (long)t.nodes.size() *
                (3 * sizeof(int32_t) + 2 * sizeof(double));
  if (!buf || cap < need) return need;
  char* p = buf;
  auto put_d = [&](double v) { std::memcpy(p, &v, 8); p += 8; };
  auto put_i = [&](int32_t v) { std::memcpy(p, &v, 4); p += 4; };
  put_d(m->init_score);
  put_i(m->num_features);
  put_i(m->best_iteration);
  put_i((int32_t)m->trees.size());
  for (const Tree& t : m->trees) {
    put_i((int32_t)t.nodes.size());
    for (const Node& nd : t.nodes) {
      put_i(nd.feature);
      put_i(nd.left);
      put_i(nd.right);
      put_d(nd.threshold);
      put_d(nd.value);
    }
  }
  return need;
}

void* gbm_deserialize(const char* buf, long len) {
  if (!buf || len < (long)(sizeof(double) + 3 * sizeof(int32_t)))
    return nullptr;
  const char* p = buf;
  const char* end = buf + len;
  auto get_d = [&](double& v) { std::memcpy(&v, p, 8); p += 8; };
  auto get_i = [&](int32_t& v) { std::memcpy(&v, p, 4); p += 4; };
  Model* m = new Model();
  int32_t nf, bi, nt;
  get_d(m->init_score);
  get_i(nf);
  get_i(bi);
  get_i(nt);
  // a corrupt/truncated blob can carry negative counts: nn < 0 passes the
  // `p + nn * 28 > end` bound (negative LHS) and then blows up in resize()
  if (nf < 0 || nt < 0 || nt > (int32_t)(len / 4)) { delete m; return nullptr; }
  m->num_features = nf;
  m->best_iteration = bi;
  for (int t = 0; t < nt; ++t) {
    if (p + 4 > end) { delete m; return nullptr; }
    int32_t nn;
    get_i(nn);
    if (nn < 0 || p + (long)nn * 28 > end) { delete m; return nullptr; }
    Tree tree;
    tree.nodes.resize(nn);
    for (int k = 0; k < nn; ++k) {
      Node& nd = tree.nodes[k];
      get_i(nd.feature);
      get_i(nd.left);
      get_i(nd.right);
      get_d(nd.threshold);
      get_d(nd.value);
      // content validation: a blob that passes the size checks can still
      // carry garbage indices. grow_tree always appends children AFTER
      // their parent, so left/right > k also guarantees predict_row
      // terminates (strictly increasing walk); feature must address a
      // training column.
      if (nd.feature >= 0) {
        if (nd.feature >= nf || nd.left <= k || nd.right <= k ||
            nd.left >= nn || nd.right >= nn) {
          delete m;
          return nullptr;
        }
      }
    }
    m->trees.push_back(std::move(tree));
  }
  return m;
}

void gbm_free(void* model) { delete (Model*)model; }

}  // extern "C"
