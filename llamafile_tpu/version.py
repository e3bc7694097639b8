"""Version string (reference: llamafile/version.h:6-11)."""
VERSION = (0, 1, 0)
VERSION_STRING = ".".join(map(str, VERSION))
