// Interleave merge of two multi-string BWTs (Holt & McMillan style) —
// the native equivalent of the reference's `bwt-merge` stage
// (SURVEY.md §2.1 "BWT merge", §3.4): merge population BWTs WITHOUT
// re-sorting the underlying reads, the path that scales past what a
// single in-core SA-IS rebuild can hold.
//
// Algorithm: iterated stable counting sort of the interleave vector.
// I[p] tags merged row p with its source (0/1). One pass applies LF to
// every row — row p's predecessor lands in bucket bwt[p], placed in
// p-order — which extends the sorted suffix depth by one character per
// pass. Sentinel rows are the fixed block [0, m1) ∪ [m1, m1+m2): all of
// source A's reads precede source B's in the merged numbering, and
// within a source the $-bucket tags are constant, so $ placements write
// constant tags into a source-split bucket. Converges (pass leaves I
// unchanged) within max-read-length + 2 passes; ties between identical
// reads across sources keep A-before-B, matching the read-level rebuild
// in index/merge.py bit-for-bit.
//
// O(n) memory (two byte vectors), O(n · maxlen) worst-case time; in
// practice passes ≈ longest shared suffix depth + 2.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {
typedef int64_t i64;
}

extern "C" {

// Merge BWTs b1 (n1 symbols, m1 reads) and b2 (n2, m2); symbol codes
// 0=$,1..4=ACGT. Writes n1+n2 merged symbols and the 0/1 interleave
// vector. Returns the number of passes run, or <0 on error
// (-1 bad args, -2 non-converged within max_passes, -3 bad symbol,
//  -4 sentinel count mismatch).
int bwt_merge2(const uint8_t* b1, int64_t n1, int64_t m1,
               const uint8_t* b2, int64_t n2, int64_t m2,
               uint8_t* merged_out, uint8_t* interleave_out,
               int64_t max_passes) {
  if (n1 < 0 || n2 < 0 || m1 < 1 || m2 < 1 || max_passes < 1) return -1;
  const i64 n = n1 + n2;

  i64 counts[5] = {0, 0, 0, 0, 0};
  for (i64 i = 0; i < n1; i++) {
    if (b1[i] > 4) return -3;
    counts[b1[i]]++;
  }
  if (counts[0] != m1) return -4;
  counts[0] = 0;
  for (i64 i = 0; i < n2; i++) {
    if (b2[i] > 4) return -3;
    counts[b2[i]]++;
  }
  counts[0] += m1;  // merged $ count
  if (counts[0] - m1 != m2) return -4;

  i64 C[6];
  C[0] = 0;
  for (int c = 0; c < 5; c++) C[c + 1] = C[c] + counts[c];

  std::vector<uint8_t> I((size_t)n), J((size_t)n);
  std::fill(I.begin(), I.begin() + (size_t)n1, 0);
  std::fill(I.begin() + (size_t)n1, I.end(), 1);

  int passes = 0;
  bool converged = false;
  while (passes < max_passes) {
    i64 ptr[5];
    ptr[0] = 0;  // unused; $ split below
    for (int c = 1; c < 5; c++) ptr[c] = C[c];
    i64 dollarA = 0, dollarB = m1;
    i64 p1 = 0, p2 = 0;
    for (i64 p = 0; p < n; p++) {
      const uint8_t b = I[(size_t)p];
      const uint8_t c = b ? b2[p2++] : b1[p1++];
      const i64 slot = (c == 0) ? (b ? dollarB++ : dollarA++) : ptr[c]++;
      J[(size_t)slot] = b;
    }
    passes++;
    if (std::memcmp(I.data(), J.data(), (size_t)n) == 0) {
      converged = true;
      break;
    }
    I.swap(J);
  }
  if (!converged) return -2;

  i64 p1 = 0, p2 = 0;
  for (i64 p = 0; p < n; p++) {
    const uint8_t b = I[(size_t)p];
    merged_out[p] = b ? b2[p2++] : b1[p1++];
    interleave_out[p] = b;
  }
  return passes;
}

}  // extern "C"
