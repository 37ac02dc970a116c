"""Convert a reference torch checkpoint (.pth/pkl) into an orbax checkpoint.

Usage:
  python scripts/convert_torch_checkpoint.py --torch model_50000_pkl \
      --config groomed_nms --num-anchors 36 --output output/groomed_nms

The resulting checkpoint loads with training.restore_checkpoint and runs
through scripts/test.py for AP parity evaluation against the released model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True, help="torch state-dict file")
    ap.add_argument("--config", required=True)
    ap.add_argument("--num-anchors", type=int, required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--step", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import torch

    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state, save_checkpoint)
    from groomed_nms_tpu.utils.torch_weights import convert_rpn_checkpoint

    cfg = load_config(args.config)
    payload = torch.load(args.torch, map_location="cpu")
    sd = payload.get("state_dict", payload)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    rpn_cfg = cfg.rpn_config(args.num_anchors)
    variables = convert_rpn_checkpoint(
        sd, num_classes=cfg.num_classes, num_anchors=args.num_anchors,
        predict_acceptance_prob=cfg.predict_acceptance_prob,
        predict_uncertainty=rpn_cfg.predict_uncertainty,
        predict_velocity=rpn_cfg.predict_velocity)

    model = RPN3D(rpn_cfg)
    tx = build_optimizer(cfg.solver_type, build_lr_schedule(cfg.lr, 100))
    state = create_train_state(model, (1, 64, 64, 3), tx)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    path = save_checkpoint(args.output, state, step=args.step)
    print("wrote", path)


if __name__ == "__main__":
    main()
