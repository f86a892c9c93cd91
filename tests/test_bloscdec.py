"""blosc1 frame codec tests (apnerf/data/bloscdec.py + native/blosclz.cpp).

Real WIM-exported ZJU caches store blosc.pack_array() payloads
(reference lib/load_zju.py:108-110); these tests cover the frame parser,
the blosclz token decoder (native and pure-python mirrors cross-checked),
the byte-shuffle filter, the zlib codec, the memcpyed fallback, and the
end-to-end compressed-cache path through load_zju.
"""
import pickle

import numpy as np
import pytest

from apnerf.data import bloscdec


def _roundtrip(data: bytes, **kw):
    frame = bloscdec.compress(data, **kw)
    out_native = bloscdec.decompress(frame)
    out_py = bloscdec.decompress(frame, force_python=True)
    assert out_native == out_py == data
    return frame


def test_literal_only_stream():
    # ctrl 0x02 = literal run of 3 bytes
    assert bloscdec._blosclz_decompress_py(bytes([0x02]) + b"abc", 3) == b"abc"


def test_short_match_stream():
    # "abc" literals then a len-3 match at distance 3 (stored d = 2)
    s = bytes([0x02]) + b"abc" + bytes([(1 << 5) | 0, 2])
    assert bloscdec._blosclz_decompress_py(s, 6) == b"abcabc"
    assert bloscdec.blosclz_decompress(s, 6) == b"abcabc"


def test_rle_stream():
    # literal 'a' then ofs=0/code=0 match: replicate the previous byte
    s = bytes([0x00]) + b"a" + bytes([(4 << 5) | 0, 0])
    assert bloscdec._blosclz_decompress_py(s, 7) == b"a" * 7
    assert bloscdec.blosclz_decompress(s, 7) == b"a" * 7


def test_long_match_with_255_extension():
    # len_code 7 + ext bytes [255, 4]: len = 6 + 255 + 4 + 3 = 268
    s = bytes([0x00]) + b"x" + bytes([(7 << 5) | 0, 255, 4, 0])
    out = bloscdec._blosclz_decompress_py(s, 269)
    assert out == b"x" * 269
    assert bloscdec.blosclz_decompress(s, 269) == out


def test_far_match_stream():
    # 9000 literal bytes, then a far match of len 4 at distance 9000:
    # ofs16 = 9000 - 8192 = 808 -> token [95, 255, 3, 40]
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 9000, dtype=np.uint8).tobytes()
    s = bytearray()
    pos = 0
    while pos < len(data):
        run = min(32, len(data) - pos)
        s.append(run - 1)
        s += data[pos:pos + run]
        pos += run
    s += bytes([(2 << 5) | 31, 255, 808 >> 8, 808 & 255])
    expect = data + data[:4]
    assert bloscdec._blosclz_decompress_py(bytes(s), 9004) == expect
    assert bloscdec.blosclz_decompress(bytes(s), 9004) == expect


def test_malformed_stream_raises():
    # match referencing before the start of output
    s = bytes([(1 << 5) | 0, 7])
    with pytest.raises(ValueError):
        bloscdec._blosclz_decompress_py(s, 3)
    with pytest.raises(ValueError):
        bloscdec.blosclz_decompress(s, 3)


@pytest.mark.parametrize("cname", ["blosclz", "zlib"])
@pytest.mark.parametrize("typesize", [1, 4, 8])
def test_compress_roundtrip(cname, typesize):
    rng = np.random.default_rng(42)
    # compressible structured data: ramps + repeats + noise patches
    base = np.arange(4096, dtype=np.int32) % 97
    data = np.concatenate([base, base, rng.integers(0, 4, 1000)]).astype(
        np.int32).tobytes() + b"tail-bytes!"  # odd length -> leftover block
    _roundtrip(data, typesize=typesize, cname=cname)


def test_multiblock_and_leftover():
    rng = np.random.default_rng(3)
    arr = (np.sin(np.linspace(0, 40, 50000)) * 100).astype(np.float32)
    data = arr.tobytes() + b"xyz"  # not a multiple of typesize
    frame = _roundtrip(data, typesize=4, blocksize=4096)
    # small blocksize really produced several blocks (header check)
    import struct
    nbytes, blocksize, _ = struct.unpack_from("<iii", frame, 4)
    assert nbytes == len(data) and blocksize == 4096


def test_memcpyed_fallback():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    frame = bloscdec.compress(data, typesize=1)
    assert frame[2] & 0x02  # incompressible -> memcpyed flag
    assert bloscdec.decompress(frame) == data


def test_shuffle_inverse():
    rng = np.random.default_rng(5)
    buf = rng.integers(0, 256, 4 * 1000 + 3, dtype=np.uint8).tobytes()
    assert bloscdec._unshuffle(bloscdec._shuffle(buf, 4), 4) == buf
    assert bloscdec._shuffle(buf, 1) == buf


@pytest.mark.parametrize("dtype", [np.uint8, np.float32, np.int64])
def test_pack_unpack_array(dtype):
    rng = np.random.default_rng(11)
    arr = (rng.random((37, 23, 3)) * 100).astype(dtype)
    frame = bloscdec.pack_array(arr)
    out = bloscdec.unpack_array(frame)
    out_py = bloscdec.unpack_array(frame, force_python=True)
    np.testing.assert_array_equal(out, arr)
    np.testing.assert_array_equal(out_py, arr)
    assert out.dtype == arr.dtype


def test_native_matches_python_on_random_streams():
    rng = np.random.default_rng(13)
    for _ in range(10):
        n = int(rng.integers(1, 20000))
        raw = rng.integers(0, int(rng.integers(2, 200)), n,
                           dtype=np.uint8).tobytes()
        comp = bloscdec.blosclz_compress(raw)
        a = bloscdec.blosclz_decompress(comp, n)
        b = bloscdec._blosclz_decompress_py(comp, n)
        assert a == b == raw


def test_load_zju_compressed_cache(tmp_path):
    """End-to-end: a blosc-packed WIM-style cache loads without blosc
    (reference lib/load_zju.py:108-110)."""
    from apnerf.data.zju import load_zju

    rng = np.random.default_rng(1)
    n_frames, n_cams, size = 3, 2, 32
    data = {
        "frame_id": np.arange(n_frames),
        "camera_id": np.repeat(np.arange(n_cams), n_frames),
        "img": [], "mask": [],
        "camera_intrinsic": [], "camera_rotation": [],
        "camera_translation": [],
    }
    raw_imgs, raw_masks = [], []
    for c in range(n_cams):
        for f in range(n_frames):
            img = rng.integers(0, 255, (3, size, size), dtype=np.uint8)
            # reference caches store the mask 2-D; the loader adds the
            # channel axis after unpacking (lib/load_zju.py:110)
            mask = (rng.random((size, size)) < 0.4).astype(np.uint8)
            raw_imgs.append(img)
            raw_masks.append(mask)
            data["img"].append(bloscdec.pack_array(img))
            data["mask"].append(bloscdec.pack_array(mask))
            K = np.array([[40.0, 0, size / 2], [0, 40.0, size / 2],
                          [0, 0, 1.0]])
            data["camera_intrinsic"].append(K)
            data["camera_rotation"].append(np.eye(3))
            data["camera_translation"].append(
                np.array([[0.0], [0.0], [3.0 + c]]))
    p = str(tmp_path / "cache_train.pickle")
    with open(p, "wb") as f:
        pickle.dump(data, f)

    out = load_zju(p, video_len=n_frames, size=size, bg_col=0)
    imgs = out[0]
    # the loader caps video_len at imgs_per_cam - 1 (reference
    # lib/load_zju.py semantics), so 2 frames x 2 cams load here
    assert imgs.shape == ((n_frames - 1) * n_cams, size, size, 3)
    # compositing matches the raw arrays: img * mask + (1-mask)*0
    k = 0  # fid 0, cam 0 -> f_id 0
    expect = np.moveaxis(raw_imgs[0] * raw_masks[0][None], 0, -1)
    np.testing.assert_array_equal(np.asarray(imgs[k]), expect)
