"""Offline iPhone capture config. The reference's
configs/iphone/gaussian_splatting.py is byte-identical to its
configs/iphone/nerfcapture.py (verified by diff); mirror that by loading
the same config."""
import os
from importlib.machinery import SourceFileLoader

_here = os.path.dirname(os.path.abspath(__file__))
config = SourceFileLoader(
    "_iphone_nerfcapture", os.path.join(_here, "nerfcapture.py")
).load_module().config
