"""Native C++ data loader tests (build + decode parity + batch prefetch)."""

import shutil

import numpy as np
import pytest

from rvio_tpu.dataio.png import write_png_gray, read_png_gray

g_pp = shutil.which("g++") is None
pytestmark = pytest.mark.skipif(g_pp, reason="no g++ toolchain")


@pytest.fixture(scope="module")
def lib():
    from rvio_tpu.dataio import native_loader
    return native_loader


class TestNativePng:
    def test_decode_matches_python(self, lib, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(60, 80), dtype=np.uint8)
        p = str(tmp_path / "a.png")
        write_png_gray(p, img)
        out = lib.decode_png_gray(p)
        np.testing.assert_array_equal(out, img)
        np.testing.assert_array_equal(out, read_png_gray(p))

    def test_decode_filtered(self, lib, tmp_path):
        # zlib-compressed rows with Up filter exercise the unfilter path
        import struct, zlib
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
        raw = b""
        prev = np.zeros(24, np.int32)
        for y in range(16):
            raw += b"\x02" + ((img[y].astype(np.int32) - prev) % 256) \
                .astype(np.uint8).tobytes()
            prev = img[y].astype(np.int32)
        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(ctype, payload):
            c = struct.pack(">I", len(payload)) + ctype + payload
            return c + struct.pack(">I",
                                   zlib.crc32(ctype + payload) & 0xFFFFFFFF)

        p = str(tmp_path / "b.png")
        with open(p, "wb") as f:
            f.write(sig + chunk(b"IHDR",
                                struct.pack(">IIBBBBB", 24, 16, 8, 0, 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        np.testing.assert_array_equal(lib.decode_png_gray(p), img)

    def test_batch_loader(self, lib, tmp_path):
        rng = np.random.default_rng(2)
        imgs = [rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
                for _ in range(6)]
        paths = []
        for i, im in enumerate(imgs):
            p = str(tmp_path / f"f{i}.png")
            write_png_gray(p, im)
            paths.append(p)
        bl = lib.BatchLoader(n_threads=3)
        bl.submit(paths, width=48, height=32)
        out = bl.collect()
        assert out.shape == (6, 32, 48)
        for i, im in enumerate(imgs):
            np.testing.assert_array_equal(out[i], im)
        # second batch reuses the pool
        bl.submit(paths[:2], width=48, height=32)
        out2 = bl.collect()
        assert out2.shape == (2, 32, 48)
        bl.close()

    def test_missing_file_raises(self, lib):
        with pytest.raises(IOError):
            lib.decode_png_gray("/nonexistent/file.png")
