// Native paged-KV block manager: free-list + refcounts + prefix-hash cache.
//
// C++ twin of nano_vllm_candle_tpu/engine/block_manager.py (same semantics,
// validated against it property-wise in tests/test_native.py). This is the
// host-side hot path of the serving engine: per-step block bookkeeping for
// every running sequence, content hashing of filled blocks, and prefix-cache
// lookups across thousands of physical blocks. The reference intended
// exactly this native role for its (stubbed) block manager
// (/root/reference/src/engine/block_manager.rs:24-29 promises "an optimized
// implementation later"; Cargo.toml:19-20 pulls ahash for it).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Block 0 is reserved as the null page (never allocated).

#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint64_t kFnvOffset = 1469598103934665603ULL;
constexpr uint64_t kFnvPrime = 1099511628211ULL;

uint64_t hash_block(uint64_t prefix, const int64_t* tokens, int n) {
  uint64_t h = kFnvOffset ^ prefix;
  for (int i = 0; i < n; ++i) {
    uint64_t v = static_cast<uint64_t>(tokens[i]);
    for (int b = 0; b < 8; ++b) {
      h ^= (v >> (8 * b)) & 0xFF;
      h *= kFnvPrime;
    }
  }
  // avoid colliding with the "no hash" sentinel
  return h == 0 ? 1 : h;
}

struct Block {
  int ref_count = 0;
  uint64_t hash = 0;  // 0 = none
  std::vector<int64_t> tokens;
};

struct Seq {
  std::vector<int> table;
};

struct BlockManager {
  int num_blocks;
  int block_size;
  bool prefix_caching;
  std::vector<Block> blocks;
  std::deque<int> free_list;
  std::unordered_map<uint64_t, int> hash_to_block;
  std::unordered_map<int64_t, Seq> seqs;

  explicit BlockManager(int nb, int bs, bool prefix)
      : num_blocks(nb), block_size(bs), prefix_caching(prefix), blocks(nb) {
    for (int i = 1; i < nb; ++i) free_list.push_back(i);
  }

  int take_free_block() {
    if (free_list.empty()) return -1;
    int id = free_list.front();
    free_list.pop_front();
    Block& b = blocks[id];
    if (b.hash != 0) {
      auto it = hash_to_block.find(b.hash);
      if (it != hash_to_block.end() && it->second == id) hash_to_block.erase(it);
    }
    b.ref_count = 1;
    b.hash = 0;
    b.tokens.clear();
    return id;
  }

  void remove_from_free(int id) {
    for (auto it = free_list.begin(); it != free_list.end(); ++it) {
      if (*it == id) {
        free_list.erase(it);
        return;
      }
    }
  }

  int blocks_needed(const Seq& s, int cur_len, int n_new) const {
    int needed = (cur_len - 1 + n_new + block_size - 1) / block_size;
    int extra = needed - static_cast<int>(s.table.size());
    return extra > 0 ? extra : 0;
  }
};

}  // namespace

extern "C" {

void* bm_create(int num_blocks, int block_size, int enable_prefix) {
  return new BlockManager(num_blocks, block_size, enable_prefix != 0);
}

void bm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int bm_num_free(void* h) {
  return static_cast<int>(static_cast<BlockManager*>(h)->free_list.size());
}

int bm_can_allocate(void* h, int num_tokens) {
  auto* bm = static_cast<BlockManager*>(h);
  int nb = (num_tokens + bm->block_size - 1) / bm->block_size;
  return nb <= static_cast<int>(bm->free_list.size()) ? 1 : 0;
}

// Builds seq_id's block table for `tokens[0..n)`. Returns num_cached_tokens
// (prefix hits), or -1 on failure (already allocated / out of blocks).
int bm_allocate(void* h, int64_t seq_id, const int64_t* tokens, int n) {
  auto* bm = static_cast<BlockManager*>(h);
  auto [it, inserted] = bm->seqs.try_emplace(seq_id);
  Seq& seq = it->second;
  if (!inserted && !seq.table.empty()) return -1;

  int num_blocks = (n + bm->block_size - 1) / bm->block_size;
  uint64_t prefix = 0;
  bool cache_hit = bm->prefix_caching;
  int num_cached = 0;
  for (int i = 0; i < num_blocks; ++i) {
    int start = i * bm->block_size;
    int len = std::min(bm->block_size, n - start);
    bool full = len == bm->block_size;
    uint64_t hsh = 0;
    if (full) {
      hsh = hash_block(prefix, tokens + start, len);
      prefix = hsh;
    }
    if (cache_hit && hsh != 0) {
      auto hit = bm->hash_to_block.find(hsh);
      if (hit != bm->hash_to_block.end()) {
        Block& b = bm->blocks[hit->second];
        if (static_cast<int>(b.tokens.size()) == len &&
            std::memcmp(b.tokens.data(), tokens + start, len * 8) == 0) {
          if (b.ref_count == 0) bm->remove_from_free(hit->second);
          b.ref_count += 1;
          seq.table.push_back(hit->second);
          num_cached += bm->block_size;
          continue;
        }
      }
    }
    cache_hit = false;
    int id = bm->take_free_block();
    if (id < 0) {
      // rollback the partial allocation
      for (auto rit = seq.table.rbegin(); rit != seq.table.rend(); ++rit) {
        Block& rb = bm->blocks[*rit];
        if (--rb.ref_count == 0) bm->free_list.push_back(*rit);
      }
      seq.table.clear();
      return -1;
    }
    Block& b = bm->blocks[id];
    b.tokens.assign(tokens + start, tokens + start + len);
    if (full && bm->prefix_caching) {
      b.hash = hsh;
      bm->hash_to_block.emplace(hsh, id);
    }
    seq.table.push_back(id);
  }
  return num_cached;
}

int bm_table_len(void* h, int64_t seq_id) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq_id);
  return it == bm->seqs.end() ? 0 : static_cast<int>(it->second.table.size());
}

int bm_get_table(void* h, int64_t seq_id, int* out, int cap) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq_id);
  if (it == bm->seqs.end()) return 0;
  int n = std::min(cap, static_cast<int>(it->second.table.size()));
  std::memcpy(out, it->second.table.data(), n * sizeof(int));
  return n;
}

int bm_can_extend(void* h, int64_t seq_id, int cur_len, int n_new) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq_id);
  if (it == bm->seqs.end()) return 0;
  return bm->blocks_needed(it->second, cur_len, n_new) <=
                 static_cast<int>(bm->free_list.size())
             ? 1
             : 0;
}

// Returns the number of blocks added, or -1 on exhaustion.
int bm_extend(void* h, int64_t seq_id, int cur_len, int n_new) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq_id);
  if (it == bm->seqs.end()) return -1;
  Seq& seq = it->second;
  int extra = bm->blocks_needed(seq, cur_len, n_new);
  for (int i = 0; i < extra; ++i) {
    int id = bm->take_free_block();
    if (id < 0) return -1;
    seq.table.push_back(id);
  }
  return extra;
}

// Content-hash every filled-but-unhashed block of this sequence.
void bm_finalize_full_blocks(void* h, int64_t seq_id, const int64_t* tokens, int n) {
  auto* bm = static_cast<BlockManager*>(h);
  if (!bm->prefix_caching) return;
  auto it = bm->seqs.find(seq_id);
  if (it == bm->seqs.end()) return;
  Seq& seq = it->second;
  int num_full = n / bm->block_size;
  uint64_t prefix = 0;
  int limit = std::min(num_full, static_cast<int>(seq.table.size()));
  for (int i = 0; i < limit; ++i) {
    Block& b = bm->blocks[seq.table[i]];
    if (b.hash == 0) {
      if (b.ref_count != 1) break;
      const int64_t* start = tokens + i * bm->block_size;
      b.tokens.assign(start, start + bm->block_size);
      b.hash = hash_block(prefix, start, bm->block_size);
      bm->hash_to_block.emplace(b.hash, seq.table[i]);
      prefix = b.hash;
    } else {
      prefix = b.hash;
    }
  }
}

void bm_deallocate(void* h, int64_t seq_id) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq_id);
  if (it == bm->seqs.end()) return;
  Seq& seq = it->second;
  for (auto rit = seq.table.rbegin(); rit != seq.table.rend(); ++rit) {
    Block& b = bm->blocks[*rit];
    if (--b.ref_count == 0) bm->free_list.push_back(*rit);
  }
  bm->seqs.erase(it);
}

}  // extern "C"
