"""Interactive viewer for trained runs (the reference's nerfstudio/viser
viewer equivalent, debug/viewer.py:86-112)."""
from .server import ViewerSession, serve  # noqa: F401
