#!/usr/bin/env python
"""Top-level HVAE training entry (mirrors reference src/main.py).

Thin shim over causal_gen_tpu.cli.main; see also:
  python -m causal_gen_tpu.cli.train_pgm  (PGM / predictors)
  python -m causal_gen_tpu.cli.train_cf   (counterfactual fine-tuning)
"""

from causal_gen_tpu.cli.main import main

if __name__ == "__main__":
    main()
