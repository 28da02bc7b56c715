"""A minimal fake `gradio` module: enough API surface to build the full
Blocks graph in CI (gradio is an optional dep and absent in this
environment).  Components record their kwargs and event handlers so tests
can introspect the graph and invoke the visibility rules."""
from __future__ import annotations

from typing import Any, Callable, Dict, List


class _Ctx:
    """Context-manager container (Blocks/Row/Column/Group/Tabs/TabItem)."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.children: List[Any] = []
        self.events: List[Dict] = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def _event(self, name, fn=None, inputs=None, outputs=None, **kw):
        self.events.append({"type": name, "fn": fn, "inputs": inputs,
                            "outputs": outputs})
        return self

    def change(self, fn=None, inputs=None, outputs=None, **kw):
        return self._event("change", fn, inputs, outputs, **kw)

    def click(self, fn=None, inputs=None, outputs=None, **kw):
        return self._event("click", fn, inputs, outputs, **kw)

    def select(self, fn=None, inputs=None, outputs=None, **kw):
        return self._event("select", fn, inputs, outputs, **kw)

    def launch(self, **kw):
        raise RuntimeError("fake gradio cannot serve")


class _Component(_Ctx):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.value = kwargs.get("value")
        self.visible = kwargs.get("visible", True)
        self.label = kwargs.get("label")


def update(**kwargs):
    return {"__type__": "update", **kwargs}


def _make(name):
    return type(name, (_Component,), {})


Blocks = _make("Blocks")
Row = _make("Row")
Column = _make("Column")
Group = _make("Group")
Box = _make("Box")
Tabs = _make("Tabs")
TabItem = _make("TabItem")
Tab = TabItem
HTML = _make("HTML")
Markdown = _make("Markdown")
Image = _make("Image")
File = _make("File")
Checkbox = _make("Checkbox")
CheckboxGroup = _make("CheckboxGroup")
Textbox = _make("Textbox")
Dropdown = _make("Dropdown")
Slider = _make("Slider")
Radio = _make("Radio")
Button = _make("Button")
Gallery = _make("Gallery")
Model3D = _make("Model3D")
Video = _make("Video")
