// Native document packer: the host-side hot path of the training input
// pipeline (TPU-native counterpart of the reference's DataLoader workers
// walking TokenizedCorpusDataset.__getitem__ state machines in Python —
// custom_dataset/tokenized_corpus.py:74-162).
//
// Implements the same closed-form padded-corpus mapping as
// block_transformer_tpu/data/packing.py: position p belongs to document
// d = upper_bound(padded_doc_starts, p) - 1 at offset
// o = p - padded_doc_starts[d] - left_pad[d]; o<0 or o>doc_len -> pad,
// o==doc_len -> EOS, else token_data[doc_start[d] + o].
//
// Exposed via a C ABI for ctypes (no pybind11 in this image). Batched fill
// is parallelized across samples with std::thread.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

template <typename T>
void fill_range(const T* token_data,
                const int64_t* doc_lengths,
                const int64_t* doc_indices,
                const int64_t* left_pad,
                const int64_t* padded_doc_starts,
                int64_t n_docs,
                int64_t eos_token,
                int64_t pad_token,
                int64_t start,       // padded-corpus position
                int64_t count,
                int32_t* out_ids,
                int8_t* out_att) {
  // find starting document via binary search (upper_bound - 1)
  int64_t lo = 0, hi = n_docs;  // first index with start < padded_doc_starts
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (padded_doc_starts[mid] <= start) lo = mid + 1; else hi = mid;
  }
  int64_t d = lo - 1;
  if (d < 0) d = 0;

  int64_t p = start;
  for (int64_t i = 0; i < count; ++i, ++p) {
    while (d + 1 < n_docs && padded_doc_starts[d + 1] <= p) ++d;
    const int64_t o = p - padded_doc_starts[d] - left_pad[d];
    const int64_t len = doc_lengths[d];
    if (o >= 0 && o < len) {
      out_ids[i] = static_cast<int32_t>(token_data[doc_indices[d] + o]);
      out_att[i] = 1;
    } else if (o == len) {
      out_ids[i] = static_cast<int32_t>(eos_token);
      out_att[i] = 1;
    } else {
      out_ids[i] = static_cast<int32_t>(pad_token);
      out_att[i] = 0;
    }
  }
}

template <typename T>
void pack_batch_impl(const T* token_data,
                     const int64_t* doc_lengths,
                     const int64_t* doc_indices,
                     const int64_t* left_pad,
                     const int64_t* padded_doc_starts,
                     int64_t n_docs,
                     int64_t padded_total,
                     int64_t eos_token,
                     int64_t pad_token,
                     const int64_t* starts,
                     int64_t batch,
                     int64_t max_length,
                     int32_t* out_ids,
                     int8_t* out_att,
                     int n_threads) {
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t b = next.fetch_add(1);
      if (b >= batch) return;
      // a sample window can wrap the padded corpus (start % total)
      int64_t s = starts[b] % padded_total;
      int64_t remaining = max_length;
      int64_t off = 0;
      while (remaining > 0) {
        const int64_t chunk =
            remaining < padded_total - s ? remaining : padded_total - s;
        fill_range<T>(token_data, doc_lengths, doc_indices, left_pad,
                      padded_doc_starts, n_docs, eos_token, pad_token, s,
                      chunk, out_ids + b * max_length + off,
                      out_att + b * max_length + off);
        remaining -= chunk;
        off += chunk;
        s = 0;
      }
    }
  };
  if (n_threads <= 1 || batch <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  const int nt = n_threads < static_cast<int>(batch)
                     ? n_threads : static_cast<int>(batch);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// dtype codes: 0=uint16, 1=int32, 2=int64, 3=uint8
int pack_batch(const void* token_data, int token_dtype,
               const int64_t* doc_lengths, const int64_t* doc_indices,
               const int64_t* left_pad, const int64_t* padded_doc_starts,
               int64_t n_docs, int64_t padded_total, int64_t eos_token,
               int64_t pad_token, const int64_t* starts, int64_t batch,
               int64_t max_length, int32_t* out_ids, int8_t* out_att,
               int n_threads) {
  switch (token_dtype) {
    case 0:
      pack_batch_impl<uint16_t>(static_cast<const uint16_t*>(token_data),
                                doc_lengths, doc_indices, left_pad,
                                padded_doc_starts, n_docs, padded_total,
                                eos_token, pad_token, starts, batch,
                                max_length, out_ids, out_att, n_threads);
      return 0;
    case 1:
      pack_batch_impl<int32_t>(static_cast<const int32_t*>(token_data),
                               doc_lengths, doc_indices, left_pad,
                               padded_doc_starts, n_docs, padded_total,
                               eos_token, pad_token, starts, batch,
                               max_length, out_ids, out_att, n_threads);
      return 0;
    case 2:
      pack_batch_impl<int64_t>(static_cast<const int64_t*>(token_data),
                               doc_lengths, doc_indices, left_pad,
                               padded_doc_starts, n_docs, padded_total,
                               eos_token, pad_token, starts, batch,
                               max_length, out_ids, out_att, n_threads);
      return 0;
    case 3:
      pack_batch_impl<uint8_t>(static_cast<const uint8_t*>(token_data),
                               doc_lengths, doc_indices, left_pad,
                               padded_doc_starts, n_docs, padded_total,
                               eos_token, pad_token, starts, batch,
                               max_length, out_ids, out_att, n_threads);
      return 0;
    default:
      return -1;
  }
}

}  // extern "C"
