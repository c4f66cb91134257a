"""Model scale presets.

The reference encodes these as commented-out alternatives in
``config.yaml:49-53`` (named n/s/m-ish in notebook 03 cell 2); here they are
first-class.
"""

PRESETS = {
    "n": {"csp": [False, True], "depth": [1, 1, 1, 1, 1, 1],
          "width": [3, 16, 32, 64, 128, 256]},
    "s": {"csp": [False, True], "depth": [1, 1, 1, 1, 1, 1],
          "width": [3, 32, 64, 128, 256, 512]},
    "m": {"csp": [True, True], "depth": [1, 1, 1, 1, 1, 1],
          "width": [3, 64, 128, 256, 512, 512]},
    "l": {"csp": [True, True], "depth": [2, 2, 2, 2, 2, 2],
          "width": [3, 64, 128, 256, 512, 512]},
    # the active reference configuration (config.yaml:53)
    "x": {"csp": [True, True], "depth": [2, 2, 2, 2, 2, 2],
          "width": [3, 96, 192, 384, 768, 768]},
    # OPT-IN, NON-PARITY: the flagship re-proportioned for the TPU MXU.
    # 'x' runs its p2/p3 CSP stages through 48/96-channel convs — at most
    # 48 of the MXU's 128 output lanes do work (measured ~38% MXU there,
    # docs/PERF.md). x-tpu pads the early widths to 128-multiples so every
    # hot conv fills the lanes; ~15% more params/FLOPs but a higher
    # throughput ceiling. Requires retraining — NOT weight-compatible
    # with 'x' (use for new training runs targeting TPU serving).
    "x-tpu": {"csp": [True, True], "depth": [2, 2, 2, 2, 2, 2],
              "width": [3, 128, 256, 512, 768, 768]},
}
