"""Framework-wide constants.

These mirror the structural constants of the reference implementation
(`/root/reference/src/bpe/engine.js:10-13`, `src/bpe/train.wgsl:32-37`) because
they are load-bearing for conformance: token ids are 16-bit, bit 16 of the u32
symbol is the word-start flag, and the pair id packing `(a << 16) | b` defines
the deterministic tie-break ordering.
"""

# Bit 16 of a u32 symbol marks the start of a pre-tokenized word.
# Reference: src/bpe/train.wgsl:36, src/bpe/trainer.js:22
WORD_START_BIT = 0x10000

# Lower 16 bits of a symbol are the token id -> max vocab 65,536.
# Reference: src/bpe/train.wgsl:37
TOKEN_MASK = 0xFFFF

# Maximum vocabulary size implied by 16-bit token ids.
MAX_VOCAB = 0x10000

# Sentinel for "no token" in tries. Reference: src/bpe/engine.js:12
INVALID_TOKEN = 0xFFFFFFFF

# Maximum merges performed per device->host round trip. The reference uses
# 128 (src/bpe/training-pipeline.js:13); we default higher because a host
# round trip is far more expensive relative to one merge here (the device
# merge loop is ~100x faster than the reference's per-merge dispatch chain),
# and the merge log is read back once per batch either way.
BATCH_MERGES = 1024

# Merge log stride: [pair, new_token_id, count] per merge.
# Reference: src/bpe/training-pipeline.js:14
MERGE_LOG_STRIDE = 3

# Trie binary format. Reference: src/bpe/tokenizer/trie.js:20-23
TRIE_MAGIC = 0x54524945  # 'TRIE'
TRIE_VERSION = 3
TRIE_SUPPORTED_VERSIONS = (2, 3)
TRIE_HEADER_SIZE = 28

# Tokenized-corpus binary export ('DXFT').
# Reference: src/ui/export-controller.js:4
DXFT_MAGIC = 0x44584654

# Greedy tokenizer chunking. Reference: src/bpe/tokenizer/tokenizer.js:17,67
DEFAULT_CHUNK_SIZE = 512
MAX_CHUNK_SIZE = 2048


def adaptive_chunk_size(max_token_len: int) -> int:
    """Chunk size used by the chunked greedy tokenizer.

    Reference: src/bpe/tokenizer/tokenizer.js:67
    """
    return max(DEFAULT_CHUNK_SIZE, min(MAX_CHUNK_SIZE, max_token_len * 8))


def pack_pair(a: int, b: int) -> int:
    """Pack a token pair into the canonical 32-bit pair id."""
    return ((a & TOKEN_MASK) << 16) | (b & TOKEN_MASK)


def unpack_pair(pair: int) -> tuple[int, int]:
    return (pair >> 16) & TOKEN_MASK, pair & TOKEN_MASK
