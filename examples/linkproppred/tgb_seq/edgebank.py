"""EdgeBank on TGB-Seq datasets.

Parity: /root/reference/examples/linkproppred/tgb_seq/edgebank.py — EdgeBank
over a ``DGData.from_tgb_seq`` stream (requires the optional ``tgb-seq``
package for real datasets; synthetic names run the standard generator).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from examples.linkproppred import edgebank as base
import examples._datasets as datasets
from tgm_tpu import DGData


def main() -> None:
    orig = datasets.load_dataset

    def load_seq(name, **kw):
        if name.startswith("synthetic"):
            return orig(name, **kw)
        return DGData.from_tgb_seq(name), None, None

    base.load_dataset = load_seq  # type: ignore[attr-defined]
    base.main()


if __name__ == "__main__":
    main()
