"""VBZ signal codec: zigzag-delta + StreamVByte + zstd.

VBZ is the HDF5 compression filter (id 32020) Oxford Nanopore applies to
raw signal in modern fast5/pod5 files (the reference notes the plugin at
docs/Install.md:50 but never ships code for it — reads with vbz signal
simply fail without the vendor plugin). This module implements the codec
pipeline from its public specification so the ingestion layer can read
vbz-compressed signal chunks WITHOUT the vendor plugin:

  int16 signal --delta--> diffs --zigzag--> uint --StreamVByte--> bytes
             --zstd--> compressed chunk

Scope and validation honesty (COVERAGE.md "Known gaps"): there is no
network egress in this environment and no real vbz-compressed file to
test against, so full container parity cannot be pinned here. What CAN
be pinned without a ground-truth file — and is, in tests/test_vbz.py —
is each primitive against *spec-derived* vectors:

- zigzag is the protobuf/streamvbyte mapping (0,-1,1,-2,... ->
  0,1,2,3,...);
- StreamVByte is Lemire's published layout (ceil(n/4) control bytes,
  2-bit length codes, little-endian 1-4 data bytes per uint32);
- zstd framing via the system libzstd (standard-format frames);
- an HDF5 integration round trip through direct-chunk I/O with filter
  id 32020 on the dataset, which is exactly how a plugin-less reader
  meets a vbz fast5.

The first action when a real vbz file is obtainable: byte-compare
compress() against the vendor filter's chunks and pin them as golden.
"""

from __future__ import annotations

import numpy as np

VBZ_FILTER_ID = 32020  # registered HDF5 filter id for vbz


# -- zigzag ----------------------------------------------------------------


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed -> unsigned zigzag (0,-1,1,-2,2 -> 0,1,2,3,4)."""
    v = values.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(
        (v & np.uint64(1)).astype(np.int64)
    )


# -- StreamVByte (Lemire layout, 32-bit values) ----------------------------


def streamvbyte_encode(values: np.ndarray) -> bytes:
    """Encode uint32 values: ceil(n/4) control bytes (2-bit codes, value
    i's code at bits 2*(i%4) of control byte i//4), then 1-4 little-
    endian data bytes per value (code = nbytes - 1)."""
    v = np.ascontiguousarray(values, np.uint32)
    n = len(v)
    if n == 0:
        return b""
    nbytes = np.ones(n, np.uint8)
    nbytes[v > 0xFF] = 2
    nbytes[v > 0xFFFF] = 3
    nbytes[v > 0xFFFFFF] = 4
    codes = (nbytes - 1).astype(np.uint8)
    n_ctrl = (n + 3) // 4
    padded = np.zeros(n_ctrl * 4, np.uint8)
    padded[:n] = codes
    ctrl = (
        padded[0::4]
        | (padded[1::4] << 2)
        | (padded[2::4] << 4)
        | (padded[3::4] << 6)
    )
    # scatter each value's little-endian bytes at its running offset
    ends = np.cumsum(nbytes.astype(np.int64))
    starts = ends - nbytes
    total = int(ends[-1])
    data = np.zeros(total, np.uint8)
    le = v.view(np.uint8).reshape(n, 4)  # little-endian lanes of each value
    for b in range(4):
        sel = nbytes > b
        if not sel.any():
            break
        data[starts[sel] + b] = le[sel, b]
    return ctrl.tobytes() + data.tobytes()


def streamvbyte_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` uint32 values from a StreamVByte stream."""
    if count == 0:
        return np.empty(0, np.uint32)
    n_ctrl = (count + 3) // 4
    raw = np.frombuffer(buf, np.uint8)
    ctrl = raw[:n_ctrl]
    codes = np.empty(n_ctrl * 4, np.uint8)
    codes[0::4] = ctrl & 3
    codes[1::4] = (ctrl >> 2) & 3
    codes[2::4] = (ctrl >> 4) & 3
    codes[3::4] = (ctrl >> 6) & 3
    nbytes = codes[:count].astype(np.int64) + 1
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    data = raw[n_ctrl:]
    if len(data) < ends[-1]:
        raise ValueError("StreamVByte stream truncated")
    out = np.zeros((count, 4), np.uint8)
    for b in range(4):
        sel = nbytes > b
        if not sel.any():
            break
        out[sel, b] = data[starts[sel] + b]
    return out.view(np.uint32).ravel()


# -- the vbz pipeline ------------------------------------------------------


def compress(
    signal: np.ndarray, zstd_level: int = 1, use_delta_zigzag: bool = True
) -> bytes:
    """Compress an int16 signal array the vbz way."""
    import zstandard

    sig = np.ascontiguousarray(signal, np.int16)
    if use_delta_zigzag:
        diffs = np.empty(len(sig), np.int64)
        if len(sig):
            diffs[0] = int(sig[0])
            np.subtract(
                sig[1:].astype(np.int64), sig[:-1].astype(np.int64),
                out=diffs[1:],
            )
        stream = streamvbyte_encode(
            zigzag_encode(diffs).astype(np.uint32)
        )
    else:
        stream = streamvbyte_encode(
            sig.astype(np.int64).astype(np.uint32)  # two's-complement wrap
        )
    return zstandard.ZstdCompressor(level=zstd_level).compress(stream)


def decompress(
    buf: bytes, count: int, use_delta_zigzag: bool = True
) -> np.ndarray:
    """Inverse of :func:`compress`; returns int16 of length ``count``."""
    import zstandard

    stream = zstandard.ZstdDecompressor().decompress(
        buf, max_output_size=max(16, count * 5 + 8)
    )
    codes = streamvbyte_decode(stream, count)
    if use_delta_zigzag:
        diffs = zigzag_decode(codes.astype(np.uint64))
        return np.cumsum(diffs).astype(np.int16)
    return codes.astype(np.uint32).astype(np.int16)


# -- HDF5 direct-chunk integration ----------------------------------------


def dataset_has_vbz(dset) -> bool:
    """True if the dataset's filter pipeline carries the vbz filter id."""
    plist = dset.id.get_create_plist()
    for i in range(plist.get_nfilters()):
        if plist.get_filter(i)[0] == VBZ_FILTER_ID:
            return True
    return False


def dataset_vbz_options(dset) -> dict:
    """The vbz filter's client values from the dataset's pipeline."""
    plist = dset.id.get_create_plist()
    for i in range(plist.get_nfilters()):
        code, _flags, vals, _name = plist.get_filter(i)
        if code == VBZ_FILTER_ID:
            return unpack_filter_options(vals)
    raise KeyError("dataset has no vbz filter")


def read_vbz_dataset(dset, use_delta_zigzag: bool = True) -> np.ndarray:
    """Read a 1-D int16 HDF5 dataset whose filter pipeline is vbz
    (filter id 32020) WITHOUT the vendor plugin, via direct chunk reads.

    This is the fallback io.fast5 uses when h5py raises the
    "filter not available" OSError on vbz-compressed Raw/Signal data.
    """
    n = dset.shape[0]
    out = np.empty(n, np.int16)
    chunk = dset.chunks[0] if dset.chunks else n
    dsid = dset.id
    for start in range(0, n, chunk):
        _mask, raw = dsid.read_direct_chunk((start,))
        stop = min(start + chunk, n)
        out[start:stop] = decompress(
            bytes(raw), stop - start, use_delta_zigzag
        )[: stop - start]
    return out


def write_vbz_dataset(
    group, name: str, signal: np.ndarray, chunk: int = 4096,
    zstd_level: int = 1,
) -> None:
    """Create an int16 dataset carrying the vbz filter id and write
    pre-compressed chunks directly (HDF5 skips filters on direct-chunk
    writes, so no plugin is needed). Produces the dataset shape a
    plugin-less reader meets in the wild; used by the synthetic fixture
    generator and the round-trip tests."""
    import h5py

    sig = np.ascontiguousarray(signal, np.int16)
    n = len(sig)
    chunk = min(chunk, max(1, n))
    space = h5py.h5s.create_simple((n,), (n,))
    dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
    dcpl.set_chunk((chunk,))
    # vbz filter options: (version, integer_size, use_zig_zag, zstd_level)
    dcpl.set_filter(
        VBZ_FILTER_ID, h5py.h5z.FLAG_OPTIONAL, (0, 2, 1, zstd_level)
    )
    dtype = h5py.h5t.NATIVE_INT16
    dsid = h5py.h5d.create(
        group.id, name.encode(), dtype, space, dcpl=dcpl
    )
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        dsid.write_direct_chunk(
            (start,), compress(sig[start:stop], zstd_level)
        )


def unpack_filter_options(opts) -> dict:
    """Decode the vbz filter client data (version, integer size, zigzag
    flag, zstd level) as stored in a dataset's filter pipeline."""
    vals = list(opts) + [0] * (4 - len(opts))
    return {
        "version": vals[0],
        "integer_size": vals[1],
        "use_zig_zag": bool(vals[2]),
        "zstd_level": vals[3],
    }
