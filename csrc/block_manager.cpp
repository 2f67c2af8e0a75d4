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
// dp_ranks > 1 partitions the page space per data-parallel rank (the
// dp-sharded KV cache, parallel/spmd.py): rank r owns pages
// [r*P/dp, (r+1)*P/dp), the FIRST page of each range is that rank's
// reserved null page, and a sequence's pages come from its home rank's
// range only. With dp_ranks == 1 this degenerates to the classic layout
// (page 0 null, one shared free list).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

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
  int rank = 0;
};

struct BlockManager {
  int num_blocks;
  int block_size;
  bool prefix_caching;
  int dp_ranks;
  int blocks_per_rank;
  std::vector<Block> blocks;
  // Per-rank free lists and prefix maps: pages of one rank are only ever
  // reusable by sequences homed on that rank (their KV lives in that
  // rank's cache shard).
  std::vector<std::deque<int>> free_by_rank;
  std::vector<std::unordered_map<uint64_t, int>> hash_by_rank;
  std::unordered_map<int64_t, Seq> seqs;

  explicit BlockManager(int nb, int bs, bool prefix, int dp)
      : num_blocks(nb),
        block_size(bs),
        prefix_caching(prefix),
        dp_ranks(dp < 1 ? 1 : dp),
        blocks_per_rank(nb / (dp < 1 ? 1 : dp)),
        blocks(nb),
        free_by_rank(dp_ranks),
        hash_by_rank(dp_ranks) {
    for (int r = 0; r < dp_ranks; ++r) {
      // First page of each rank's range is its reserved null page.
      for (int i = r * blocks_per_rank + 1; i < (r + 1) * blocks_per_rank; ++i)
        free_by_rank[r].push_back(i);
    }
  }

  int num_free() const {
    int n = 0;
    for (const auto& q : free_by_rank) n += static_cast<int>(q.size());
    return n;
  }

  int take_free_block(int rank) {
    auto& free_list = free_by_rank[rank];
    if (free_list.empty()) return -1;
    int id = free_list.front();
    free_list.pop_front();
    Block& b = blocks[id];
    if (b.hash != 0) {
      auto& map = hash_by_rank[rank];
      auto it = map.find(b.hash);
      if (it != map.end() && it->second == id) map.erase(it);
    }
    b.ref_count = 1;
    b.hash = 0;
    b.tokens.clear();
    return id;
  }

  void remove_from_free(int rank, int id) {
    auto& free_list = free_by_rank[rank];
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

void* bm_create(int num_blocks, int block_size, int enable_prefix,
                int dp_ranks) {
  if (dp_ranks < 1) dp_ranks = 1;
  if (num_blocks % dp_ranks != 0) return nullptr;
  return new BlockManager(num_blocks, block_size, enable_prefix != 0,
                          dp_ranks);
}

void bm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int bm_num_free(void* h) { return static_cast<BlockManager*>(h)->num_free(); }

int bm_num_free_rank(void* h, int rank) {
  auto* bm = static_cast<BlockManager*>(h);
  if (rank < 0 || rank >= bm->dp_ranks) return 0;
  return static_cast<int>(bm->free_by_rank[rank].size());
}

int bm_can_allocate(void* h, int num_tokens, int rank) {
  auto* bm = static_cast<BlockManager*>(h);
  if (rank < 0 || rank >= bm->dp_ranks) return 0;
  int nb = (num_tokens + bm->block_size - 1) / bm->block_size;
  return nb <= static_cast<int>(bm->free_by_rank[rank].size()) ? 1 : 0;
}

// Builds seq_id's block table for `tokens[0..n)` from `rank`'s page pool.
// Returns num_cached_tokens (prefix hits), or -1 on failure (already
// allocated / out of blocks / bad rank).
int bm_allocate(void* h, int64_t seq_id, const int64_t* tokens, int n,
                int rank) {
  auto* bm = static_cast<BlockManager*>(h);
  if (rank < 0 || rank >= bm->dp_ranks) return -1;
  auto [it, inserted] = bm->seqs.try_emplace(seq_id);
  Seq& seq = it->second;
  if (!inserted && !seq.table.empty()) return -1;
  seq.rank = rank;

  int num_blocks = (n + bm->block_size - 1) / bm->block_size;
  uint64_t prefix = 0;
  bool cache_hit = bm->prefix_caching;
  int num_cached = 0;
  auto& map = bm->hash_by_rank[rank];
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
      auto hit = map.find(hsh);
      if (hit != map.end()) {
        Block& b = bm->blocks[hit->second];
        if (static_cast<int>(b.tokens.size()) == len &&
            std::memcmp(b.tokens.data(), tokens + start, len * 8) == 0) {
          if (b.ref_count == 0) bm->remove_from_free(rank, hit->second);
          b.ref_count += 1;
          seq.table.push_back(hit->second);
          num_cached += bm->block_size;
          continue;
        }
      }
    }
    cache_hit = false;
    int id = bm->take_free_block(rank);
    if (id < 0) {
      // rollback the partial allocation
      for (auto rit = seq.table.rbegin(); rit != seq.table.rend(); ++rit) {
        Block& rb = bm->blocks[*rit];
        if (--rb.ref_count == 0) bm->free_by_rank[rank].push_back(*rit);
      }
      seq.table.clear();
      return -1;
    }
    Block& b = bm->blocks[id];
    b.tokens.assign(tokens + start, tokens + start + len);
    if (full && bm->prefix_caching) {
      b.hash = hsh;
      map.emplace(hsh, id);
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
  const Seq& seq = it->second;
  return bm->blocks_needed(seq, cur_len, n_new) <=
                 static_cast<int>(bm->free_by_rank[seq.rank].size())
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
    int id = bm->take_free_block(seq.rank);
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
  auto& map = bm->hash_by_rank[seq.rank];
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
      map.emplace(b.hash, seq.table[i]);
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
    // A page returns to the rank range it belongs to.
    if (--b.ref_count == 0)
      bm->free_by_rank[*rit / bm->blocks_per_rank].push_back(*rit);
  }
  bm->seqs.erase(it);
}

}  // extern "C"
