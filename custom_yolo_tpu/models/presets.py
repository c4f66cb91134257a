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
    # 'x' runs its p2/p3 CSP stages through deep chains of 48/96-channel
    # convs — at most 48 of the MXU's 128 output lanes do work and the
    # chain is strictly sequential (measured ~38% MXU, docs/PERF.md).
    # x-tpu keeps x's widths/depths but uses Residual CSP (csp[0]=False,
    # the n/s-preset structure) at p2/p3: ~4× fewer narrow sequential ops
    # in the two wall stages. Requires retraining — NOT weight-compatible
    # with 'x'. (A wider variant [3,128,256,512,768,768] with full C3K
    # was measured SLOWER than x — 479 vs 603 img/s at B=128 — because
    # C3K2's concat→conv2 grows quadratically with width.)
    "x-tpu": {"csp": [False, True], "depth": [2, 2, 2, 2, 2, 2],
              "width": [3, 96, 192, 384, 768, 768]},
}
