#!/usr/bin/env python
"""Generate the committed arithmetic-JPEG fixtures (tests/data/
arith_*.jpg) with the system libjpeg as the encoding oracle, and pin:

- the ENGINE-decoded pixel md5 (the QM decode is spec-exact and the
  engine IDCT is deterministic, so these are stable forever — the
  demo_webp_lossy pattern);
- the libjpeg-decoded max pixel delta at generation time (gray: <=1,
  pure IDCT rounding; 4:2:0 color: larger, upsampling-filter choice —
  replication here vs libjpeg's fancy bilinear — NOT entropy error);
- coefficient-level EXACTNESS vs jpeg_read_coefficients (proves the
  entropy decoder bit-for-bit on every fixture, color included).

Writes tests/data/jpegarith_pins.json. Requires gcc + libjpeg
(present in this container); re-run only to regenerate fixtures.
"""

import hashlib
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")
TOOL_C = os.path.join(HERE, "devtools", "jpegarith_tool.c")


def build_tool(tmp):
    exe = os.path.join(tmp, "jpegarith_tool")
    subprocess.run(["gcc", "-O2", "-o", exe, TOOL_C, "-ljpeg"],
                   check=True)
    return exe


def fixtures():
    rng = np.random.RandomState(14)
    yy, xx = np.indices((40, 56))
    photo = ((np.sin(yy / 5.0) * np.cos(xx / 7.0) * 90) + 128) \
        .astype(np.uint8)
    grad = (np.indices((24, 17)).sum(0)[..., None]
            * np.array([7, 11, 13]) % 256).astype(np.uint8)
    noise = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    colorn = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    return [
        ("arith_gray_photo_q90_rst3.jpg", photo, 90, 3, False),
        ("arith_color_grad_q85.jpg", grad, 85, 0, False),
        ("arith_gray_noise_q95.jpg", noise, 95, 0, False),
        ("arith_color_noise_q60_rst2.jpg", colorn, 60, 2, False),
        ("arith_prog_color_q80.jpg", colorn, 80, 0, True),
        ("arith_prog_gray_q88.jpg", photo, 88, 0, True),
    ]


def coef_truth(exe, jpg):
    out = subprocess.run([exe, "coef", jpg], capture_output=True,
                         text=True, check=True).stdout
    blocks = {}
    for line in out.splitlines():
        if line.startswith("blk "):
            head, vals = line.split(":")
            _, ci, by, bx = head.split()
            blocks[(int(ci), int(by), int(bx))] = \
                [int(v) for v in vals.split()]
    return blocks


def engine_coeffs(data):
    from datasketches_spark_spark.operators import jpegcodec as jc
    cap = {}
    orig = jc._reconstruct

    def spy(frame, coeffs, qt):
        cap["frame"], cap["coeffs"] = frame, coeffs
        return orig(frame, coeffs, qt)

    jc._reconstruct = spy
    try:
        px = jc.decode_jpeg(data)
    finally:
        jc._reconstruct = orig
    return px, cap["frame"], cap["coeffs"]


def main():
    from datasketches_spark_spark.operators.jpegcodec import ZIGZAG
    os.makedirs(DATA, exist_ok=True)
    pins = {}
    with tempfile.TemporaryDirectory() as tmp:
        exe = build_tool(tmp)
        for name, arr, q, rst, prog in fixtures():
            nc = 1 if arr.ndim == 2 else 3
            pnm = os.path.join(tmp, "in.pnm")
            with open(pnm, "wb") as fh:
                fh.write((b"P5\n" if nc == 1 else b"P6\n")
                         + f"{arr.shape[1]} {arr.shape[0]}\n255\n"
                         .encode() + arr.tobytes())
            jpg = os.path.join(DATA, name)
            cmd = [exe, "enc", pnm, jpg, str(q), str(rst)]
            if prog:
                cmd.append("progressive")
            subprocess.run(cmd, check=True)
            ref_pnm = os.path.join(tmp, "ref.pnm")
            subprocess.run([exe, "dec", jpg, ref_pnm], check=True)
            body = open(ref_pnm, "rb").read().split(b"255\n", 1)[1]
            data = open(jpg, "rb").read()
            px, frame, coeffs = engine_coeffs(data)
            ref = np.frombuffer(body, dtype=np.uint8).reshape(px.shape)
            maxdiff = int(np.abs(px.astype(int) - ref.astype(int)).max())
            # coefficient-level exactness (entropy decoder proof)
            truth = coef_truth(exe, jpg)
            bad = 0
            for ci, comp in enumerate(frame["comps"]):
                zz = coeffs[comp["id"]]
                for (tci, by, bx), tv in truth.items():
                    if tci != ci or by >= zz.shape[0] \
                            or bx >= zz.shape[1]:
                        continue
                    mine = np.zeros(64, dtype=np.int64)
                    mine[ZIGZAG] = zz[by, bx]
                    if list(mine) != tv:
                        bad += 1
            assert bad == 0, f"{name}: {bad} coefficient mismatches"
            pins[name] = {
                "engine_px_md5": hashlib.md5(px.tobytes()).hexdigest(),
                "shape": list(px.shape),
                "libjpeg_px_maxdiff": maxdiff,
                "coef_blocks_exact": len(truth),
            }
            print(name, pins[name])
    with open(os.path.join(DATA, "jpegarith_pins.json"), "w") as fh:
        json.dump(pins, fh, indent=1, sort_keys=True)
    print("pins written")


if __name__ == "__main__":
    main()
