"""Minimal test-only stub of the `yacs` package.

Provides just the CfgNode surface the reference's config system uses
(`/root/reference/perspective2d/config/config.py`,
`perspective2d/utils/config.py`): attribute-style nested nodes,
merge_from_file (YAML), freeze/defrost/clone. Used only to import the
reference code for graph-parity tests — never shipped.
"""
