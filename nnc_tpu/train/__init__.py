from . import lsa, presets
