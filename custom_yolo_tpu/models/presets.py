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
}
