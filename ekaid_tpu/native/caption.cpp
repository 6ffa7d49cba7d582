// Native host-side caption-metric kernels.
//
// The reference's metric stack bottoms out in native code (pycocotools
// C, pycocoevalcap Java jars — SURVEY.md §2.3); the TPU rebuild keeps
// the algorithms in ekaid_tpu/metrics/caption.py and provides these C++
// fast paths for the per-segment inner loops that dominate large eval
// sweeps (~70K test answers × up to 91 tokens):
//
//   * lcs_len        — ROUGE-L's O(T²) dynamic program.
//   * bleu_counts    — clipped n-gram match/total counts per segment
//                      (n-grams packed into 64-bit keys, vocab < 2^16;
//                      counting via sorted vectors, no hashing).
//   * meteor_align   — the staged greedy METEOR alignment (exact ids,
//                      stem ids, synset ids) returning matches, chunks
//                      and per-stage match counts.
//
// Tokens arrive as int32 ids (Python owns the string→id mapping);
// unit tests assert bit-equality against the Python implementations.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

// Collect sorted packed n-grams of order n from ids[0..len).
void ngrams(const int32_t* ids, int64_t len, int n,
            std::vector<uint64_t>* out) {
  out->clear();
  if (len < n) return;
  for (int64_t i = 0; i + n <= len; ++i) {
    uint64_t key = 0;
    for (int j = 0; j < n; ++j)
      key = (key << 16) | static_cast<uint64_t>(ids[i + j] & 0xffff);
    out->push_back(key);
  }
  std::sort(out->begin(), out->end());
}

// Count of each distinct value in a sorted vector, as (value, count)
// runs walked in lockstep by the callers below.

}  // namespace

extern "C" {

int64_t lcs_len(const int32_t* a, int64_t na, const int32_t* b,
                int64_t nb) {
  if (na == 0 || nb == 0) return 0;
  std::vector<int64_t> prev(nb + 1, 0), cur(nb + 1, 0);
  for (int64_t i = 1; i <= na; ++i) {
    for (int64_t j = 1; j <= nb; ++j) {
      if (a[i - 1] == b[j - 1])
        cur[j] = prev[j - 1] + 1;
      else
        cur[j] = prev[j] > cur[j - 1] ? prev[j] : cur[j - 1];
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Clipped BLEU counts for one candidate against nrefs references.
// refs_flat: concatenated reference ids; ref_lens[nrefs].
// out_matches/out_totals: [max_n] each.
void bleu_counts(const int32_t* cand, int64_t nc,
                 const int32_t* refs_flat, const int64_t* ref_lens,
                 int64_t nrefs, int64_t max_n, int64_t* out_matches,
                 int64_t* out_totals) {
  std::vector<uint64_t> cg, rg, best;
  for (int n = 1; n <= max_n; ++n) {
    ngrams(cand, nc, n, &cg);
    out_totals[n - 1] = static_cast<int64_t>(cg.size());
    // max reference count per n-gram ("clip" numerator)
    best.clear();  // parallel to runs of cg
    std::vector<int64_t> best_cnt;
    // gather distinct candidate n-grams + their counts
    std::vector<uint64_t> dv;
    std::vector<int64_t> dc;
    for (size_t i = 0; i < cg.size();) {
      size_t j = i;
      while (j < cg.size() && cg[j] == cg[i]) ++j;
      dv.push_back(cg[i]);
      dc.push_back(static_cast<int64_t>(j - i));
      i = j;
    }
    std::vector<int64_t> maxref(dv.size(), 0);
    const int32_t* rp = refs_flat;
    for (int64_t r = 0; r < nrefs; ++r) {
      ngrams(rp, ref_lens[r], n, &rg);
      rp += ref_lens[r];
      // count occurrences of each dv entry in rg (both sorted)
      size_t gi = 0;
      for (size_t i = 0; i < dv.size(); ++i) {
        while (gi < rg.size() && rg[gi] < dv[i]) ++gi;
        size_t gj = gi;
        while (gj < rg.size() && rg[gj] == dv[i]) ++gj;
        int64_t cnt = static_cast<int64_t>(gj - gi);
        if (cnt > maxref[i]) maxref[i] = cnt;
        gi = gj;
      }
    }
    int64_t m = 0;
    for (size_t i = 0; i < dv.size(); ++i)
      m += dc[i] < maxref[i] ? dc[i] : maxref[i];
    out_matches[n - 1] = m;
  }
}

// Staged greedy METEOR alignment (metrics/caption.py::_meteor15_align
// parity). hyp_syn/ref_syn: synset id per token (-1 = none; a single
// representative synset id is enough for the bundled disjoint table).
// Writes out_align[i] = matched ref index or -1 and out_stage[i] =
// matching stage (0 exact / 1 stem / 2 synonym) or -1; returns the
// chunk count.
int64_t meteor_align(const int32_t* hyp, const int32_t* hyp_stem,
                     const int32_t* hyp_syn, int64_t nh,
                     const int32_t* ref, const int32_t* ref_stem,
                     const int32_t* ref_syn, int64_t nr,
                     int32_t* out_align, int32_t* out_stage) {
  std::vector<int8_t> used(nr, 0);
  for (int64_t i = 0; i < nh; ++i) {
    out_align[i] = -1;
    out_stage[i] = -1;
  }
  for (int s = 0; s < 3; ++s) {
    const int32_t* h = s == 0 ? hyp : (s == 1 ? hyp_stem : hyp_syn);
    const int32_t* r = s == 0 ? ref : (s == 1 ? ref_stem : ref_syn);
    for (int64_t i = 0; i < nh; ++i) {
      if (out_align[i] >= 0) continue;
      if (s == 2 && h[i] < 0) continue;
      for (int64_t j = 0; j < nr; ++j) {
        if (!used[j]) {
          bool eq = (s == 2) ? (r[j] >= 0 && h[i] == r[j])
                             : (h[i] == r[j]);
          if (eq) {
            out_align[i] = static_cast<int32_t>(j);
            out_stage[i] = s;
            used[j] = 1;
            break;
          }
        }
      }
    }
  }
  // a chunk requires adjacency in BOTH strings (METEOR definition)
  int64_t chunks = 0, prev_i = -2, prev_j = -2;
  for (int64_t i = 0; i < nh; ++i) {
    if (out_align[i] < 0) continue;
    if (i != prev_i + 1 || out_align[i] != prev_j + 1) ++chunks;
    prev_i = i;
    prev_j = out_align[i];
  }
  return chunks;
}

}  // extern "C"
