"""Interactive viewer: device-side sim + skinning, thin WebGL2 browser client
(SURVEY.md §7.1 `tetsim/viewer`; replaces the reference's three.js World and
pointer Grabber with a server/client split suited to an accelerator host).
"""
from .server import ViewerServer  # noqa: F401
