# Sphinx configuration for the parmgmc_tpu documentation site.
#
# Mirrors the reference's docs setup (/root/reference/docs/conf.py +
# .readthedocs.yaml): the site is built off-box (ReadTheDocs or any
# host with sphinx + myst-parser installed); the development box
# deliberately has no sphinx (no pip installs), so `make -C docs html`
# is expected to run in CI/RTD only.  The pages themselves are plain
# Markdown (rendered fine on any forge even without a built site).

project = "parmgmc_tpu"
author = "parmgmc_tpu developers"
copyright = "2026, parmgmc_tpu developers"

extensions = [
    "myst_parser",  # the docs are Markdown (docs/*.md)
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
master_doc = "index"
exclude_patterns = ["_build"]

# API docstrings cite the reference implementation as `file:line` into
# /root/reference; keep them verbatim (they are provenance, not links).
autodoc_member_order = "bysource"
autodoc_typehints = "description"

html_theme = "furo"
html_title = "parmgmc_tpu"

myst_enable_extensions = ["dollarmath", "linkify", "tasklist"]
myst_heading_anchors = 3
