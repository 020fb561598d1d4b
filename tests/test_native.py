"""Native extension tests (build + parity with python fallbacks)."""

import numpy as np
import pytest

from diffusiondrive_tpu.native import get_native, histogram2d, lzf_decompress


def lzf_compress_reference(data: bytes) -> bytes:
    """Tiny LZF compressor (literal runs only) — valid LZF, no back-refs."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = min(32, len(data) - i)
        out.append(run - 1)
        out += data[i : i + run]
        i += run
    return bytes(out)


@pytest.fixture(scope="module")
def native():
    mod = get_native()
    if mod is None:
        pytest.skip("no C++ toolchain available")
    return mod


def test_lzf_roundtrip_literals(native):
    data = bytes(range(256)) * 10
    comp = lzf_compress_reference(data)
    out = lzf_decompress(comp, len(data))
    assert out == data


def test_lzf_matches_python_fallback(native):
    """Back-reference streams: compare against the pure-python decoder on a
    hand-crafted stream with overlapping references."""
    from diffusiondrive_tpu.common.dataclasses import load_pcd  # noqa: F401  (import check)

    # stream: literal "abcabc", then back-ref len=5 offset=3 (overlapping)
    stream = bytes([5]) + b"abcabc" + bytes([(3 << 5) | 0, 2])
    # ctrl=(3<<5): len=3+2=5, ref = op - (0<<8) - 2 - 1 = op-3
    expected_tail = b"abcab"
    out = lzf_decompress(stream, 6 + 5)
    assert out[:6] == b"abcabc"
    assert out[6:] == expected_tail

    # python fallback must agree
    import diffusiondrive_tpu.common.dataclasses as dc

    py_out = bytearray()
    # call the module-level pure python path by bypassing native: replicate
    # via the documented algorithm
    i, n = 0, len(stream)
    data = stream
    while i < n and len(py_out) < 11:
        ctrl = data[i]; i += 1
        if ctrl < 32:
            run = ctrl + 1
            py_out += data[i : i + run]; i += run
        else:
            length = ctrl >> 5
            if length == 7:
                length += data[i]; i += 1
            ref = len(py_out) - ((ctrl & 0x1F) << 8) - data[i] - 1; i += 1
            for _ in range(length + 2):
                py_out.append(py_out[ref]); ref += 1
    assert bytes(py_out) == out


def test_native_histogram_matches_numpy(native):
    rng = np.random.default_rng(0)
    x = rng.uniform(-35, 35, 50000).astype(np.float32)
    y = rng.uniform(-35, 35, 50000).astype(np.float32)
    ours = histogram2d(x, y, -32, 32, -32, 32, 256)
    edges = np.linspace(-32, 32, 257)
    ref = np.histogramdd(np.stack([x, y], -1), bins=(edges, edges))[0]
    assert ours.sum() == ref.sum()
    mismatch = (ours != ref).sum()
    assert mismatch / ours.size < 1e-4  # fp boundary points only


def test_compressed_pcd_roundtrip(native, tmp_path):
    """Write a binary_compressed PCD using literal-only LZF; read it back."""
    from diffusiondrive_tpu.common.dataclasses import load_pcd

    n = 100
    rng = np.random.default_rng(1)
    fields = rng.normal(size=(6, n)).astype(np.float32)
    # column-major payload: all x, all y, ...
    payload = b"".join(fields[i].tobytes() for i in range(6))
    comp = lzf_compress_reference(payload)
    import struct

    header = (
        "VERSION 0.7\nFIELDS x y z intensity ring lidar_id\n"
        "SIZE 4 4 4 4 4 4\nTYPE F F F F F F\nCOUNT 1 1 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary_compressed\n"
    )
    path = tmp_path / "pc.pcd"
    with open(path, "wb") as fp:
        fp.write(header.encode())
        fp.write(struct.pack("<II", len(comp), len(payload)))
        fp.write(comp)

    out = load_pcd(path)
    np.testing.assert_allclose(out, fields, atol=1e-6)
