"""Posting-block codec: delta-encoded docID gaps + term frequencies,
varint- or bitpack-compressed, in fixed-size blocks carrying block-max
metadata (SURVEY.md §2.1 I6; BASELINE.json north_star: "per-partition sorted
posting lists (term -> delta-encoded docID gaps + term frequencies,
varint/PForDelta-compressed)").

Everything here is vectorized numpy — these functions run inside Arrow
kernels (``applyInPandas``) on executors, so per-element Python loops are
forbidden (BASELINE.json input_hint: "no per-row Python").

Blob wire format: 1 codec-id byte (0x01 varint / 0x02 bitpack) + payload.
Bitpack payload: u8 width, u32le count, little-endian bit-packed values.
"""

from __future__ import annotations

import numpy as np

from . import BLOCK_SIZE

CODEC_VARINT = 0x01
CODEC_BITPACK = 0x02


# ---------------------------------------------------------------- varint ---

def _varint_encode_sized(vals: np.ndarray):
    """LEB128-encode a uint64 array, vectorized.  Returns (bytes, per-value
    byte counts) so callers can split the stream at value boundaries."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), bitlen(0) treated as 1.
    # Exact bit length via 6 whole-array shift passes (float log2 is
    # unsafe near 2^53).
    bitlen = np.zeros(n, dtype=np.int64)
    tmp = vals.copy()
    for shift in (32, 16, 8, 4, 2, 1):  # 6 iterations, each whole-array
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        bitlen[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    bitlen += 1  # tmp is now 0 or 1; values 0/1 both need 1 bit
    nbytes = (bitlen + 6) // 7
    maxb = int(nbytes.max())
    # 7-bit groups, little-endian
    shifts = (np.arange(maxb, dtype=np.uint64) * np.uint64(7))
    groups = (vals[:, None] >> shifts[None, :]) & np.uint64(0x7F)
    groups = groups.astype(np.uint8)
    byte_idx = np.arange(maxb)[None, :]
    used = byte_idx < nbytes[:, None]
    cont = byte_idx < (nbytes[:, None] - 1)
    groups[cont] |= 0x80
    return groups[used].tobytes(), nbytes


def _varint_encode(vals: np.ndarray) -> bytes:
    return _varint_encode_sized(vals)[0]


def _varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized via reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    value_id = np.zeros(len(b), dtype=np.int64)
    value_id[ends[:-1] + 1] = 1
    value_id = np.cumsum(value_id)
    offs = np.arange(len(b), dtype=np.uint64) - starts[value_id].astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (offs * np.uint64(7))
    return np.add.reduceat(contrib, starts)


# --------------------------------------------------------------- bitpack ---

def _bitpack_encode(vals: np.ndarray) -> bytes:
    """Frame-of-reference binary packing: fixed bit-width = max bitlen.

    The PForDelta-family fast path (SURVEY.md §2.1 I6 "PForDelta v2"):
    per-block fixed-width packing; block sizes are small (128) so the
    no-exceptions variant stays within ~1 bit/val of patched PFor on
    gap distributions while keeping decode branch-free.
    """
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return bytes([0]) + np.uint32(0).tobytes()
    mx = int(vals.max())
    width = max(1, mx.bit_length())
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return bytes([width]) + np.uint32(n).tobytes() + packed.tobytes()


def _bitpack_decode(buf: bytes) -> np.ndarray:
    width = buf[0]
    n = int(np.frombuffer(buf[1:5], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf[5:], dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


# ------------------------------------------------------------- public API ---

def encode_u64(vals: np.ndarray, codec: int = CODEC_VARINT) -> bytes:
    if codec == CODEC_VARINT:
        return bytes([CODEC_VARINT]) + _varint_encode(vals)
    if codec == CODEC_BITPACK:
        return bytes([CODEC_BITPACK]) + _bitpack_encode(vals)
    raise ValueError(f"unknown codec {codec}")


def decode_u64(buf: bytes) -> np.ndarray:
    codec = buf[0]
    if codec == CODEC_VARINT:
        return _varint_decode(buf[1:])
    if codec == CODEC_BITPACK:
        return _bitpack_decode(buf[1:])
    raise ValueError(f"unknown codec byte {codec}")


def encode_u64_blocked(vals: np.ndarray, starts: np.ndarray,
                       codec: int = CODEC_VARINT) -> list[bytes]:
    """Encode ``vals`` split at ``starts`` (block start offsets) → one blob
    per block.  Varint path is a SINGLE vectorized pass over the whole
    array, then a byte-offset split — per-block numpy-call overhead (which
    dominates at 128-value blocks) is gone."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    if codec == CODEC_VARINT:
        prefix = bytes([CODEC_VARINT])
        if len(vals) == 0:
            return [prefix] * len(starts)
        stream, sizes = _varint_encode_sized(vals)
        csum = np.cumsum(sizes)
        byte_starts = np.zeros(len(starts), dtype=np.int64)
        nz = starts > 0
        byte_starts[nz] = csum[starts[nz] - 1]
        ends = np.empty(len(starts), dtype=np.int64)
        ends[:-1] = byte_starts[1:]
        ends[-1] = len(stream)
        return [prefix + stream[byte_starts[i]:ends[i]]
                for i in range(len(starts))]
    # bitpack width is per-block → per-block encode (non-default path)
    bounds = list(starts) + [len(vals)]
    return [encode_u64(vals[bounds[i]:bounds[i + 1]], codec)
            for i in range(len(starts))]


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    block_size: int = BLOCK_SIZE,
    codec: int = CODEC_VARINT,
):
    """Split one term's sorted posting list into fixed-size blocks.

    Returns parallel lists: (first_doc, last_doc, n, gaps_blob, tfs_blob,
    block_max_tf).  gaps[0] == 0 by construction; decode is
    ``first_doc + cumsum(gaps)``.  Blocks are self-contained (absolute
    first_doc per block) so salted sub-lists with disjoint docID ranges
    concatenate without re-encoding (SURVEY.md I11/R6).

    Fully vectorized across blocks: one gap pass, one varint pass, one
    reduceat for block-max — no per-block loops in the hot path.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        return [], [], [], [], [], []
    starts = np.arange(0, n, block_size, dtype=np.int64)
    ends = np.minimum(starts + block_size, n)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = 0
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:], casting="unsafe")
    gaps[starts] = 0  # each block is self-based at its first_doc
    gaps_blobs = encode_u64_blocked(gaps, starts, codec)
    tf_blobs = encode_u64_blocked(tfs.astype(np.uint64), starts, codec)
    maxtfs = np.maximum.reduceat(tfs, starts)
    firsts = doc_ids[starts]
    lasts = doc_ids[ends - 1]
    lens = (ends - starts).astype(np.int64)
    return (firsts.tolist(), lasts.tolist(), lens.tolist(),
            gaps_blobs, tf_blobs, maxtfs.tolist())


def decode_block(first_doc: int, gaps_blob: bytes, tfs_blob: bytes):
    """Inverse of one encode_blocks element → (doc_ids int64, tfs int64)."""
    gaps = decode_u64(gaps_blob)
    doc_ids = np.cumsum(gaps, dtype=np.uint64).astype(np.int64) + np.int64(first_doc)
    tfs = decode_u64(tfs_blob).astype(np.int64)
    return doc_ids, tfs
