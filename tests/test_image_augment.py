"""image_augment (operators/multimodal.py): augmented blob pixels match
an independent scalar reconstruction; params are deterministic and
seed-sensitive."""

from __future__ import annotations

import hashlib

import numpy as np

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import multimodal


def _fixture(spark):
    rows = []
    for image_id, w, h in [("i1", 13, 9), ("i2", 8, 8), ("i3", 21, 5)]:
        r, c, b = np.ogrid[0:h, 0:w, 0:3]
        arr = ((r * 5 + c * 11 + b * 17) % 256).astype(np.uint8)
        rows.append((image_id, codecs.encode_raw(arr), "raw", arr))
    df = spark.createDataFrame(
        [(i, b_, f) for i, b_, f, _a in rows], "image_id string, bytes binary, fmt string"
    )
    return df, {i: a for i, _b, _f, a in rows}


def scalar_params(image_id: str, seed: int):
    v = int(hashlib.md5(f"{image_id}|aug{seed}".encode()).hexdigest()[:8], 16)
    return v & 1, (v >> 1) & 1, (v >> 2) & 3, ((v >> 4) & 63) - 32


def test_blob_matches_scalar_reconstruction(spark):
    df, arrs = _fixture(spark)
    got = {r["image_id"]: r for r in multimodal.image_augment(df, seed=0).collect()}
    for image_id, src in arrs.items():
        hf, vf, k, delta = scalar_params(image_id, 0)
        r = got[image_id]
        assert (r["do_hflip"], r["do_vflip"], r["rot_k"], r["delta"]) == (hf, vf, k, delta)
        want = src
        if hf:
            want = want[:, ::-1]
        if vf:
            want = want[::-1, :]
        want = np.rot90(want, k=k)
        want = np.clip(want.astype(np.int32) + delta, 0, 255).astype(np.uint8)
        aug = codecs.decode_raw(bytes(r["aug"]))
        assert np.array_equal(aug, want)
        assert (r["out_h"], r["out_w"]) == want.shape[:2]
        assert r["pix_sum"] == int(want.sum(dtype=np.int64))
        assert r["first_byte"] == int(want[0, 0, 0])
        assert r["row0_sum"] == int(want[0].sum(dtype=np.int64))


def test_deterministic_and_seed_sensitive(spark):
    df, _ = _fixture(spark)
    a = {r["image_id"]: bytes(r["aug"]) for r in multimodal.image_augment(df, seed=0).collect()}
    b = {r["image_id"]: bytes(r["aug"]) for r in multimodal.image_augment(df, seed=0).collect()}
    c = {r["image_id"]: bytes(r["aug"]) for r in multimodal.image_augment(df, seed=1).collect()}
    assert a == b                      # reproducible
    assert any(a[i] != c[i] for i in a)  # seed actually changes params
