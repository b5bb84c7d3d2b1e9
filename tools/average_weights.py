"""Average several ``.weights`` checkpoints into one.

Usage:
    python tools/average_weights.py out.weights in1.weights in2.weights [...]

Tail-averaging BC fine-tunes typically buys a small generalization bump; the
reference carried this capability vestigially (torch_util.py:121-132).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    out, *ins = sys.argv[1:]
    import torch

    from vpt_tpu.checkpoint.averaging import load_average

    import numpy as np

    sd = load_average(ins)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, out)
    print(f"averaged {len(ins)} checkpoints ({len(sd)} tensors) → {out}")


if __name__ == "__main__":
    main()
