# Ensures the in-tree `opticalflow_tpu` package is importable in tests
# without installation (pytest prepends this directory to sys.path).
