"""Perceptual average-hash: determinism, invariance, and the Spark stage."""

import numpy as np
import pytest
from pyspark.sql import Row

from datasketches_spark_spark.operators.imagecodec import (
    average_hash, encode_bmp, encode_ppm)
from datasketches_spark_spark.operators.multimodal import (
    perceptual_hash_images)


def _two_tone(a, b):
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = a
    img[:, 4:] = b
    return img


def test_closed_forms():
    assert average_hash(_two_tone(96, 32)) == "f0f0f0f0f0f0f0f0"
    assert average_hash(_two_tone(32, 96)) == "0f0f0f0f0f0f0f0f"
    assert average_hash(np.full((8, 8, 3), 77, np.uint8)) == "0" * 16
    assert len(average_hash(_two_tone(96, 32), grid=4)) == 4


def test_noise_invariance_but_bytes_differ():
    img = _two_tone(96, 32)
    noisy = img.copy()
    noisy[0, 0] = 97
    assert encode_ppm(img) != encode_ppm(noisy)
    assert average_hash(img) == average_hash(noisy)


def test_big_image_block_means():
    # 64x64 two-tone: block means reduce exactly to the 8x8 case
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :32] = 96
    img[:, 32:] = 32
    assert average_hash(img) == "f0f0f0f0f0f0f0f0"


def test_nondivisible_dims_resize_path():
    img = np.zeros((6, 10, 3), np.uint8)
    img[:, :5] = 200
    assert average_hash(img) == "f0f0f0f0f0f0f0f0"


def test_grayscale_and_luma_weighting():
    g = np.zeros((8, 8), np.uint8)
    g[:, :4] = 200
    assert average_hash(g) == "f0f0f0f0f0f0f0f0"
    # pure-blue vs pure-red halves: luma weights decide the bright side
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, :4, 0] = 255  # red luma 76
    rgb[:, 4:, 2] = 255  # blue luma 29
    assert average_hash(rgb) == "f0f0f0f0f0f0f0f0"


def test_spark_stage_ppm_and_bmp(spark):
    rows = [Row(id=1, payload=bytearray(encode_ppm(_two_tone(96, 32)))),
            Row(id=2, payload=bytearray(encode_bmp(_two_tone(96, 32)))),
            Row(id=3, payload=bytearray(encode_ppm(_two_tone(32, 96))))]
    df = spark.createDataFrame(rows)
    out = {r.id: r.phash
           for r in perceptual_hash_images(df, "id").collect()}
    # same visual content hashes equal across CONTAINERS (ppm vs bmp)
    assert out[1] == out[2] == "f0f0f0f0f0f0f0f0"
    assert out[3] == "0f0f0f0f0f0f0f0f"


def test_undecodable_payload_surfaces(spark):
    df = spark.createDataFrame([Row(id=1, payload=bytearray(b"\xff\xd8\xffX"))])
    with pytest.raises(Exception, match="(?i)jpeg|NotImplemented"):
        perceptual_hash_images(df, "id").collect()
