"""Console entry points (pyproject [project.scripts]) for the four CLIs.

The repo-root shims (train.py / test.py / single_image_test.py / bench.py)
keep the reference-style `python train.py ...` invocation working; after
`pip install` the same mains are available as aaclip-train / aaclip-test /
aaclip-single-image / aaclip-bench.
"""
