"""Export a TPU-trained TAN checkpoint back to the reference ``.pth.tar`` format.

The reference eco-system consumes flat torch dicts ``{epoch, state_dict,
best_acc, optimizer, iteration}`` (reference utils/utils.py:39-57,
train/main.py:146-151); its eval harnesses (eval/eval_zeroshot_align.py:255-359)
and downstream tooling load them with the non-strict ``neq_load_customized``.
This CLI is the missing half of interop: a model trained here can be handed
back to anyone running the upstream code.

Input: a bare orbax params dir (the ``params_latest`` export every train CLI
writes) or an experiment dir (auto-picks ``params_latest`` and, when present,
``ema_latest`` for the Stage-2 twin ``online.*``/``target.*`` key space).

    python -m temporalalignnet_tpu.tools.export_torch \
        --params runs/stage2_exp --out cotrain_export.pth.tar --epoch 3

Round-trip tested (torch -> flax -> torch bitwise, and a flax-trained model
re-scored by the torch replica) in tests/test_torch_export.py.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional


def _resolve(path: str, leaf: str) -> Optional[str]:
    sub = os.path.join(path, leaf)
    return sub if os.path.isdir(sub) else None


def main(argv: Optional[List[str]] = None) -> str:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", required=True,
                   help="orbax params dir, or an experiment dir containing "
                        "params_latest (+ ema_latest for Stage-2)")
    p.add_argument("--ema_params", default=None,
                   help="orbax dir for the EMA/target twin half; defaults to "
                        "<params>/ema_latest when that exists")
    p.add_argument("--out", required=True, help="output .pth.tar path")
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--iteration", type=int, default=0)
    p.add_argument("--best_acc", type=float, default=0.0)
    args = p.parse_args(argv)

    from temporalalignnet_tpu.checkpoint import load_params
    from temporalalignnet_tpu.checkpoint.torch_convert import (
        save_reference_checkpoint,
    )

    params_dir = args.params
    ema_dir = args.ema_params
    if os.path.isdir(params_dir) and _resolve(params_dir, "params_latest"):
        if ema_dir is None:
            ema_dir = _resolve(params_dir, "ema_latest")
        params_dir = _resolve(params_dir, "params_latest")

    params = load_params(params_dir)
    ema = load_params(ema_dir) if ema_dir else None
    save_reference_checkpoint(
        args.out, params, ema,
        epoch=args.epoch, iteration=args.iteration, best_acc=args.best_acc,
    )
    kind = "twin (online/target)" if ema is not None else "plain"
    print(f"wrote {kind} reference checkpoint: {args.out}")
    return args.out


if __name__ == "__main__":
    main()
