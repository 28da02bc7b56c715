"""User-facing surfaces: CLI, REST API, and (optional) Gradio UI —
re-creations of the reference's main.py / scripts/depthmap_api.py /
src/common_ui.py entry points."""
