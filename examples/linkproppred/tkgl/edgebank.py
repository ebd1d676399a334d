"""EdgeBank on tkgl-* temporal knowledge graphs.

Parity: /root/reference/examples/linkproppred/tkgl/edgebank.py — same
EdgeBank flow with the TKG pre-generated negative sampler (dst-id ranges).
With a ``tkgl-*`` dataset name the candidates come from
``TGBTKGNegativeEdgeSamplerHook``; synthetic datasets fall back to injected
candidate arrays.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from examples.linkproppred import edgebank as base
from tgm_tpu.hooks import TGBTKGNegativeEdgeSamplerHook


def main() -> None:
    # Swap the sampler family for knowledge-graph negatives; everything else
    # (memory, scoring, MRR) is identical to the base EdgeBank example.
    base.TGBNegativeEdgeSamplerHook = TGBTKGNegativeEdgeSamplerHook  # type: ignore[attr-defined]
    base.main()


if __name__ == "__main__":
    main()
