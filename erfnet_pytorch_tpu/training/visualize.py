"""Dashboard — parity with the reference's ``train/visualize.py`` (SURVEY.md
§2a row 13): a visdom line/image plotter used every ``--steps-plot``.

visdom is not part of this image's baked dependencies, so the Dashboard
degrades to a no-op (with one warning) when the import fails — the CLI
surface (``--visualize --port``) keeps working either way.
"""

from __future__ import annotations

import numpy as np


class Dashboard:
    def __init__(self, port=8097):
        try:
            import visdom  # type: ignore
            self.vis = visdom.Visdom(port=port)
            self._ok = True
        except Exception as e:  # pragma: no cover - depends on env
            print(f"[visualize] visdom unavailable ({e!r}); plots disabled")
            self.vis = None
            self._ok = False

    def loss(self, losses, title):
        if not self._ok:
            return
        self.vis.line(np.array(losses), win=title,
                      opts=dict(title=title))

    def image(self, image, title):
        """image: (H, W, 3) float in [0,1] or (3, H, W) — torch-habit safe."""
        if not self._ok:
            return
        img = np.asarray(image)
        if img.ndim == 3 and img.shape[-1] == 3:
            img = img.transpose(2, 0, 1)
        self.vis.image(img, win=title, opts=dict(title=title))
