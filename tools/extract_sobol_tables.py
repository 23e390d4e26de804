"""Extract Sobol direction-number tables from the reference into .npy assets.

The tables (SOBOL_MATRICES_32, VD_C_SOBOL_MATRICES{,_INV}) are public-domain
mathematical constants (PBRT / rs_pbrt Sobol direction numbers, see reference
src/pathtracer/sobolmatrices.rs:1-8). We ship them as packed numpy arrays:

  sobol_32.npy   — (1024, 52) uint32  per-dimension generator matrices
  sobol_vdc.npy  — (25, 52) uint64    van-der-Corput matrices (rows m=1..25)
  sobol_vdc_inv.npy — (26, 52) uint64 inverse vdc matrices (rows m=1..26)

Rows are zero-padded to width 52; row m of vdc has 2m meaningful entries.
"""

import re
import sys

import numpy as np

SRC = "/root/reference/src/pathtracer/sobolmatrices.rs"
OUT_DIR = "/root/repo/pathtracer_tpu/assets"


def parse_numbers(text: str) -> list[int]:
    return [int(tok.replace("_", ""), 16) for tok in re.findall(r"0x[0-9a-fA-F_]+", text)]


def main() -> None:
    text = open(SRC).read()

    m32_match = re.search(
        r"pub const SOBOL_MATRICES_32:.*?=\s*\[(.*?)\];", text, re.S)
    m32 = parse_numbers(m32_match.group(1))
    assert len(m32) == 1024 * 52, len(m32)
    sobol_32 = np.array(m32, dtype=np.uint32).reshape(1024, 52)

    const_arrays: dict[str, list[int]] = {}
    for m in re.finditer(r"const (MI?\d+): \[u64; (\d+)\] = \[(.*?)\];", text, re.S):
        name, n, body = m.group(1), int(m.group(2)), m.group(3)
        vals = parse_numbers(body)
        assert len(vals) == n, (name, len(vals), n)
        const_arrays[name] = vals

    vdc = np.zeros((25, 52), dtype=np.uint64)
    for k in range(1, 26):
        vals = const_arrays[f"M{k}"]
        assert len(vals) == 52 - 2 * k  # frame-bit budget: 52 total index bits
        vdc[k - 1, : len(vals)] = np.array(vals, dtype=np.uint64)

    vdc_inv = np.zeros((26, 52), dtype=np.uint64)
    for k in range(1, 27):
        vals = const_arrays[f"MI{k}"]
        assert len(vals) == 2 * k
        vdc_inv[k - 1, : len(vals)] = np.array(vals, dtype=np.uint64)

    np.save(f"{OUT_DIR}/sobol_32.npy", sobol_32)
    np.save(f"{OUT_DIR}/sobol_vdc.npy", vdc)
    np.save(f"{OUT_DIR}/sobol_vdc_inv.npy", vdc_inv)
    print("wrote", sobol_32.shape, vdc.shape, vdc_inv.shape)


if __name__ == "__main__":
    sys.exit(main())
