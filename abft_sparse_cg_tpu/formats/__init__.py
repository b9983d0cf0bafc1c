"""Matrix formats: MM I/O, loader pipeline, protected containers."""

from .loader import AssembledMatrix, assemble, load_matrix
from .mmio import MMHeader, read_coordinate, read_header, write_coordinate
from .protected import FORMATS, ProtectedMatrix, build_protected

__all__ = [
    "AssembledMatrix",
    "assemble",
    "load_matrix",
    "MMHeader",
    "read_coordinate",
    "read_header",
    "write_coordinate",
    "FORMATS",
    "ProtectedMatrix",
    "build_protected",
]
