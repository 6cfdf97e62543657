"""VBZ codec: spec-derived vectors + round trips + plugin-less HDF5 read.

No real vbz-compressed file exists in this environment (no egress), so
container-level golden parity cannot be pinned here — what IS pinned is
each primitive against vectors derived from its published specification
(zigzag: protobuf encoding docs; StreamVByte: Lemire's published byte
layout), plus the end-to-end plugin-less fast5 read the codec exists
for. See deepmod_tpu/io/vbz.py's docstring for the honesty statement.
"""

import os

import h5py
import numpy as np
import pytest

from deepmod_tpu.io import vbz


# -- zigzag: the published mapping ----------------------------------------


def test_zigzag_spec_vectors():
    # protobuf's signed-varint table: 0,-1,1,-2,2,... -> 0,1,2,3,4,...
    signed = np.array([0, -1, 1, -2, 2, 2147483647, -2147483648], np.int64)
    want = np.array([0, 1, 2, 3, 4, 4294967294, 4294967295], np.uint64)
    np.testing.assert_array_equal(vbz.zigzag_encode(signed), want)
    np.testing.assert_array_equal(vbz.zigzag_decode(want), signed)


def test_zigzag_roundtrip_random():
    rng = np.random.default_rng(0)
    v = rng.integers(-(2**31), 2**31, 10000)
    np.testing.assert_array_equal(
        vbz.zigzag_decode(vbz.zigzag_encode(v)), v
    )


# -- StreamVByte: the published layout ------------------------------------


def test_streamvbyte_spec_vectors():
    # One value per length class. Control codes are 2 bits each, value i
    # at bits 2*(i%4); code = nbytes-1; data bytes little-endian.
    vals = np.array([0x01, 0x0100, 0x010000, 0x01000000], np.uint32)
    enc = vbz.streamvbyte_encode(vals)
    # codes: 0,1,2,3 -> control byte 0b11100100 = 0xE4
    assert enc[0] == 0xE4
    assert enc[1:] == bytes(
        [0x01,            # 1-byte value 0x01
         0x00, 0x01,      # 2-byte LE 0x0100
         0x00, 0x00, 0x01,       # 3-byte LE 0x010000
         0x00, 0x00, 0x00, 0x01]  # 4-byte LE 0x01000000
    )
    np.testing.assert_array_equal(vbz.streamvbyte_decode(enc, 4), vals)


def test_streamvbyte_zero_is_one_byte():
    # the 32-bit StreamVByte spec has no 0-byte code: zero encodes as one
    # 0x00 data byte with control code 0
    enc = vbz.streamvbyte_encode(np.array([0], np.uint32))
    assert enc == bytes([0x00, 0x00])
    np.testing.assert_array_equal(
        vbz.streamvbyte_decode(enc, 1), np.array([0], np.uint32)
    )


def test_streamvbyte_partial_control_byte():
    # n not a multiple of 4: unused code slots are zero-padded
    vals = np.array([0xFF, 0xFFFF, 0xABCDE], np.uint32)
    enc = vbz.streamvbyte_encode(vals)
    assert enc[0] == 0b00100100  # codes 0,1,2 then padding 0
    np.testing.assert_array_equal(vbz.streamvbyte_decode(enc, 3), vals)


def test_streamvbyte_boundaries_and_random():
    rng = np.random.default_rng(1)
    boundary = np.array(
        [0, 1, 0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFF, 0x1000000,
         0xFFFFFFFF], np.uint32,
    )
    for vals in (
        boundary,
        rng.integers(0, 2**32, 4097).astype(np.uint32),
        rng.integers(0, 255, 1000).astype(np.uint32),
        np.empty(0, np.uint32),
    ):
        enc = vbz.streamvbyte_encode(vals)
        np.testing.assert_array_equal(
            vbz.streamvbyte_decode(enc, len(vals)), vals
        )


def test_streamvbyte_truncated_raises():
    enc = vbz.streamvbyte_encode(np.array([0x01000000], np.uint32))
    with pytest.raises(ValueError, match="truncated"):
        vbz.streamvbyte_decode(enc[:-1], 1)


# -- the pipeline ----------------------------------------------------------


def test_vbz_roundtrip_signal_like():
    rng = np.random.default_rng(2)
    # nanopore-shaped signal: a slowly wandering level + noise, int16
    level = np.repeat(rng.integers(400, 900, 200), 50)
    sig = (level + rng.normal(0, 12, len(level))).astype(np.int16)
    for use_dz in (True, False):
        blob = vbz.compress(sig, zstd_level=1, use_delta_zigzag=use_dz)
        out = vbz.decompress(blob, len(sig), use_delta_zigzag=use_dz)
        np.testing.assert_array_equal(out, sig)
    # delta-zigzag must actually help on this shape of data
    assert len(vbz.compress(sig, use_delta_zigzag=True)) < len(
        vbz.compress(sig, use_delta_zigzag=False)
    )


def test_vbz_roundtrip_extremes():
    for sig in (
        np.empty(0, np.int16),
        np.array([0], np.int16),
        np.array([-32768, 32767, -32768, 0, 1, -1], np.int16),
        np.full(5000, -32768, np.int16),
    ):
        blob = vbz.compress(sig)
        np.testing.assert_array_equal(
            vbz.decompress(blob, len(sig)), sig
        )


# -- HDF5 integration: the plugin-less read path ---------------------------


def test_hdf5_direct_chunk_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    sig = rng.integers(-2000, 2000, 10_001).astype(np.int16)
    path = str(tmp_path / "vbz.h5")
    with h5py.File(path, "w") as fh:
        grp = fh.create_group("Raw")
        vbz.write_vbz_dataset(grp, "Signal", sig, chunk=4096)
    with h5py.File(path, "r") as fh:
        dset = fh["Raw/Signal"]
        assert vbz.dataset_has_vbz(dset)
        opts = vbz.dataset_vbz_options(dset)
        assert opts["integer_size"] == 2 and opts["use_zig_zag"]
        # plain reads fail without the vendor plugin...
        with pytest.raises(OSError):
            dset[()]
        # ...the direct-chunk codec path succeeds
        np.testing.assert_array_equal(vbz.read_vbz_dataset(dset), sig)


def test_fast5_reader_falls_back_to_vbz(tmp_path):
    """A synthetic fast5 whose Signal dataset is vbz-compressed reads
    end-to-end through the standard ingestion path (event stats equal
    the uncompressed file's)."""
    from deepmod_tpu.io.fast5 import Fast5ReadOptions, read_fast5_file
    from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

    out = str(tmp_path / "ds")
    generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrZ": 6000}, num_reads=1,
                    read_length=(600, 800), seed=23),
    )
    import glob

    src = sorted(glob.glob(os.path.join(out, "fast5", "**", "*.fast5"),
                           recursive=True))[0]
    dst = str(tmp_path / "vbz.fast5")
    # rewrite with the Signal dataset vbz-compressed, all else copied
    with h5py.File(src, "r") as a, h5py.File(dst, "w") as b:
        def copy(name, obj):
            if isinstance(obj, h5py.Dataset) and name.endswith("Signal"):
                parent = b.require_group(os.path.dirname(name))
                vbz.write_vbz_dataset(
                    parent, "Signal", np.asarray(obj[()], np.int16)
                )
            elif isinstance(obj, h5py.Dataset):
                b.create_dataset(name, data=obj[()])
            else:
                b.require_group(name)
            tgt = b[name]
            for k, v in obj.attrs.items():
                tgt.attrs[k] = v
        a.visititems(copy)
        for k, v in a.attrs.items():
            b.attrs[k] = v
    opts = Fast5ReadOptions()
    ref_read = read_fast5_file(src, opts)
    vbz_read = read_fast5_file(dst, opts)
    np.testing.assert_array_equal(ref_read.raw_signals, vbz_read.raw_signals)
    np.testing.assert_array_equal(ref_read.m_event, vbz_read.m_event)
