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
//   * meteor_align   — the METEOR-1.5 Aligner beam search (exact ids,
//                      stem ids, synset ids): maximize covered words,
//                      then minimize chunks, then minimize summed
//                      match-position distance; beam 40 like the jar.
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

// METEOR-1.5 Aligner beam search (metrics/caption.py::_meteor15_align
// parity). hyp_syn/ref_syn: synset id per token (-1 = none; a single
// representative synset id is enough for disjoint tables — the Python
// wrapper gates on that). Resolution criteria, in priority order:
// maximize covered words; minimize chunk count (adjacency required in
// BOTH strings); minimize sum |i - j| of match positions. Beam width
// 40 over hyp positions, like the jar's partial-alignment search.
// Writes out_align[i] = matched ref index or -1 and out_stage[i] =
// matching stage (0 exact / 1 stem / 2 synonym) or -1; returns the
// chunk count of the selected alignment. Requires nr <= 64 (bitmask);
// falls back to -1 chunks (caller uses Python path) beyond that.
int64_t meteor_align(const int32_t* hyp, const int32_t* hyp_stem,
                     const int32_t* hyp_syn, int64_t nh,
                     const int32_t* ref, const int32_t* ref_stem,
                     const int32_t* ref_syn, int64_t nr,
                     int32_t* out_align, int32_t* out_stage) {
  for (int64_t i = 0; i < nh; ++i) {
    out_align[i] = -1;
    out_stage[i] = -1;
  }
  if (nr > 64) return -1;  // caller falls back to the Python search

  struct State {
    int32_t matches, chunks, dist;
    int32_t prev_i, prev_j;
    uint64_t used;
    std::vector<int32_t> pair_j;      // per-hyp ref index (-1 = none)
    std::vector<int32_t> pair_s;      // per-hyp stage
  };
  const size_t kBeam = 40;
  std::vector<State> states(1);
  states[0] = {0, 0, 0, -2, -2, 0ull,
               std::vector<int32_t>(nh, -1), std::vector<int32_t>(nh, -1)};

  std::vector<State> nxt;
  for (int64_t i = 0; i < nh; ++i) {
    nxt.clear();
    for (const State& st : states) {
      nxt.push_back(st);               // leave hyp[i] unmatched
      for (int64_t j = 0; j < nr; ++j) {
        if (st.used >> j & 1) continue;
        int stage;
        if (hyp[i] == ref[j]) stage = 0;
        else if (hyp_stem[i] == ref_stem[j]) stage = 1;
        else if (hyp_syn[i] >= 0 && hyp_syn[i] == ref_syn[j]) stage = 2;
        else continue;
        State ns = st;
        bool contiguous = (st.prev_i == i - 1) && (st.prev_j == j - 1);
        ns.matches += 1;
        ns.chunks += contiguous ? 0 : 1;
        ns.dist += static_cast<int32_t>(i > j ? i - j : j - i);
        ns.prev_i = static_cast<int32_t>(i);
        ns.prev_j = static_cast<int32_t>(j);
        ns.used |= 1ull << j;
        ns.pair_j[i] = static_cast<int32_t>(j);
        ns.pair_s[i] = stage;
        nxt.push_back(std::move(ns));
      }
    }
    std::stable_sort(nxt.begin(), nxt.end(),
                     [](const State& a, const State& b) {
                       if (a.matches != b.matches) return a.matches > b.matches;
                       if (a.chunks != b.chunks) return a.chunks < b.chunks;
                       return a.dist < b.dist;
                     });
    if (nxt.size() > kBeam) nxt.resize(kBeam);
    states.swap(nxt);
  }
  const State& best = states.front();
  for (int64_t i = 0; i < nh; ++i) {
    out_align[i] = best.pair_j[i];
    out_stage[i] = best.pair_s[i];
  }
  return best.chunks;
}

}  // extern "C"
