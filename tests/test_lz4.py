"""Pure-Python LZ4 codec tests (frame + block round-trips, edge cases).

Real EuRoC bags compressed with ``rosbag compress --lz4`` store standard
LZ4 frames per chunk; rvio_tpu decodes them without the C binding
(rvio_tpu/dataio/lz4.py).  These tests round-trip the block and frame
layers and pin the hand-checked wire format of tiny blocks.
"""

import struct

import numpy as np
import pytest

from rvio_tpu.dataio.lz4 import (FRAME_MAGIC, LEGACY_MAGIC, compress_block,
                                 compress_frame, decompress_block,
                                 decompress_frame)


def _payloads():
    rng = np.random.default_rng(42)
    return {
        "empty": b"",
        "short": b"abc",
        "no_match": bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
        "runs": b"\x00" * 1000 + b"ab" * 500 + b"\xff" * 77,
        "text": (b"the quick brown fox jumps over the lazy dog " * 100),
        "binary": bytes(rng.integers(0, 8, 100_000, dtype=np.uint8)),
        "overlap": b"a" * 3 + b"abcabcabc" * 50,  # forces overlapping copies
    }


class TestBlock:
    @pytest.mark.parametrize("name", list(_payloads()))
    def test_roundtrip(self, name):
        data = _payloads()[name]
        blk = compress_block(data)
        assert decompress_block(blk) == data

    def test_compresses_redundant_data(self):
        data = b"x" * 10_000
        assert len(compress_block(data)) < 100

    def test_literal_only_block(self):
        # hand-built: token 0x50 = 5 literals, no match (final sequence)
        assert decompress_block(b"\x50hello") == b"hello"

    def test_match_block(self):
        # 4 literals "abab", then match offset 2 len 4+4=8 -> "abababab",
        # then final literal run "Z"
        blk = b"\x44abab\x02\x00" + b"\x10Z"
        assert decompress_block(blk) == b"abab" + b"abababab" + b"Z"

    def test_long_literal_extension(self):
        data = bytes(np.random.default_rng(0).integers(0, 256, 300,
                                                       dtype=np.uint8))
        blk = compress_block(data)
        # 300 incompressible bytes: token F0, ext 255, 30
        assert blk[0] == 0xF0 and blk[1] == 255 and blk[2] == 300 - 15 - 255
        assert decompress_block(blk) == data

    def test_zero_offset_rejected(self):
        with pytest.raises(ValueError, match="offset"):
            decompress_block(b"\x44abab\x00\x00")

    def test_offset_before_start_rejected(self):
        with pytest.raises(ValueError, match="offset"):
            decompress_block(b"\x14a\xff\x00")


class TestFrame:
    @pytest.mark.parametrize("name", list(_payloads()))
    def test_roundtrip(self, name):
        data = _payloads()[name]
        assert decompress_frame(compress_frame(data)) == data

    def test_magic(self):
        frm = compress_frame(b"payload")
        assert struct.unpack_from("<I", frm, 0)[0] == FRAME_MAGIC

    def test_stored_block_when_incompressible(self):
        data = bytes(np.random.default_rng(3).integers(0, 256, 256,
                                                       dtype=np.uint8))
        frm = compress_frame(data)
        # header: magic(4) FLG BD size(8) HC = 15 bytes; then block header
        bsize = struct.unpack_from("<I", frm, 15)[0]
        assert bsize & 0x80000000  # stored (uncompressed) block
        assert decompress_frame(frm) == data

    def test_block_checksum_flag_skipped(self):
        # build a frame with B.Checksum set; decoder must skip the 4 bytes
        data = b"hello world hello world hello world"
        blk = compress_block(data)
        flg = (1 << 6) | 0x10
        frm = (struct.pack("<I", FRAME_MAGIC) + bytes([flg, 0x40, 0])
               + struct.pack("<I", len(blk)) + blk + b"\x00\x00\x00\x00"
               + struct.pack("<I", 0))
        assert decompress_frame(frm) == data

    def test_legacy_frame(self):
        data = b"legacy format payload " * 10
        frm = (struct.pack("<I", LEGACY_MAGIC)
               + struct.pack("<I", len(compress_block(data)))
               + compress_block(data))
        assert decompress_frame(frm) == data

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            decompress_frame(b"\x00\x01\x02\x03rest")

    def test_truncated_rejected(self):
        frm = compress_frame(b"some data here some data here")
        with pytest.raises(ValueError):
            decompress_frame(frm[:10])
