"""EdgeBank on thgl-* heterogeneous temporal graphs.

Parity: /root/reference/examples/linkproppred/thgl/edgebank.py — EdgeBank
with the THG (node-type-constrained) pre-generated negative sampler.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from examples.linkproppred import edgebank as base
from tgm_tpu.hooks import TGBTHGNegativeEdgeSamplerHook


def main() -> None:
    base.TGBNegativeEdgeSamplerHook = TGBTHGNegativeEdgeSamplerHook  # type: ignore[attr-defined]
    base.main()


if __name__ == "__main__":
    main()
