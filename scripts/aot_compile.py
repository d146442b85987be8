"""AOT-precompile the flagship train/eval steps (VERDICT r2 task 6).

Thin alias for ``scripts/train.py --aot``: builds the EXACT training
pipeline (same model config, optimizer, loss, metrics, batch shapes), then
``jit(...).lower().compile()``s the train and eval steps against the
persistent compilation cache (/tmp/jax_cache) and exits. A training run
started afterwards with the same config rides the warm cache instead of
paying the 42-branch + 2x100-iteration-unroll compile at startup.

Usage (self-contained sys.path setup — no PYTHONPATH needed):
    python scripts/aot_compile.py -c configs/train_local.json -m 10 -M 20
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.train import main  # noqa: E402

if __name__ == "__main__":
    sys.argv.append("--aot")
    main()
