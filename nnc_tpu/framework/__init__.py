from . import torch_io
