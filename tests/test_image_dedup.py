"""Perceptual image dedup (operators/multimodal.py image_dhash /
image_near_dup_pairs) on synthetic NetPBM images: near-identical images pair
up, unrelated images don't, undecodable payloads are excluded."""

from __future__ import annotations

from parqueryd_spark.operators.multimodal import image_dhash, image_near_dup_pairs


def _ppm(pixels: list[list[int]]) -> bytes:
    """P6 image from a grayscale grid (each value replicated to RGB)."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(v for row in pixels for v in row for _ in range(3))
    return b"P6\n%d %d\n255\n" % (w, h) + body


def _gradient(w=18, h=16, flip=False, noise_at=None) -> list[list[int]]:
    grid = [
        [(255 - x * 14 if flip else x * 14) % 256 for x in range(w)]
        for _ in range(h)
    ]
    if noise_at:
        x, y = noise_at
        grid[y][x] = (grid[y][x] + 40) % 256
    return grid


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_dhash_stable_under_small_noise_and_distinct_otherwise(spark):
    base = _ppm(_gradient())
    near = _ppm(_gradient(noise_at=(5, 3)))     # one perturbed pixel
    far = _ppm(_gradient(flip=True))            # reversed gradient
    df = _media(spark, [(1, base), (2, near), (3, far)])
    hashes = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert hashes[1] == hashes[2]  # one pixel in a 2x2 box barely moves means
    # signatures are SIGNED longs — mask before popcounting the xor
    assert bin((hashes[1] ^ hashes[3]) & (2**64 - 1)).count("1") > 20


def test_near_dup_pairs_blocks_and_verifies(spark):
    base = _ppm(_gradient())
    near = _ppm(_gradient(noise_at=(5, 3)))
    far = _ppm(_gradient(flip=True))
    undecodable = b"not an image at all"
    df = _media(spark, [(1, base), (2, near), (3, far), (4, undecodable)])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(df, max_hamming=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert all(3 not in p and 4 not in p for p in pairs)


def test_undecodable_payloads_hash_null(spark):
    df = _media(spark, [(7, b"plain text payload")])
    [row] = image_dhash(df).collect()
    assert row.dhash is None
