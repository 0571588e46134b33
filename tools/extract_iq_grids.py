"""One-time extraction of the GGUF i-quant codebook grids.

The IQ1/IQ2/IQ3 formats quantize weights onto fixed codebooks (E8/D4
lattice subsets found empirically by the ggml project). The grids are
PUBLIC FORMAT CONSTANTS — every GGUF implementation carries the same
tables verbatim (ggml is MIT-licensed; the reference vendors them in
kernels/quantization/gguf/ggml-common.h) — but they are not derivable
from a formula, so this script parses them out of a ggml source header
once and stores them as a binary data file the loader ships:

    python tools/extract_iq_grids.py <path/to/ggml-common.h>
        -> aphrodite_tpu/loader/iq_grids.npz

The sign helper table (ksigns_iq2xs) IS derivable (odd-parity bit 7)
and is computed at load instead of stored.
"""

import re
import sys

import numpy as np

GRIDS = {
    # name in header -> (numpy dtype, expected length, our key)
    "iq2xxs_grid": (np.uint64, 256, "iq2xxs"),
    "iq2xs_grid": (np.uint64, 512, "iq2xs"),
    "iq2s_grid": (np.uint64, 1024, "iq2s"),
    "iq3xxs_grid": (np.uint32, 256, "iq3xxs"),
    "iq3xs_grid": (np.uint32, 512, "iq3s"),
    "iq1s_grid": (np.uint64, 512, "iq1s"),
}


def main() -> int:
    src = sys.argv[1]
    text = open(src).read()
    out = {}
    for name, (dtype, n, key) in GRIDS.items():
        m = re.search(name + r"\[\d+\]\s*=\s*\{(.*?)\};", text,
                      re.DOTALL)
        if not m:
            print(f"grid {name} not found in {src}")
            return 1
        vals = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+",
                                               m.group(1))]
        assert len(vals) == n, (name, len(vals))
        out[key] = np.array(vals, dtype=dtype)
    import os

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "aphrodite_tpu", "loader",
        "iq_grids.npz")
    np.savez_compressed(dst, **out)
    print(f"wrote {dst}: " + ", ".join(
        f"{k}[{len(v)}]" for k, v in out.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
