"""Pure-Python oracle crawler implementing the semantics.py contract."""
