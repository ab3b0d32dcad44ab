"""Clean-checkout install smoke (SURVEY.md §1 CLI layer — the public
interface contract).

Everything else in the suite runs from the working tree with an
already-built native library; this proves the package works from scratch:
``git archive`` the committed tree, ``pip install -e`` it into a fresh
venv (offline: --no-build-isolation/--no-deps against the baked-in
system packages), run every console script's ``--help``, and import the
native loader with NO ``_loader.so`` present so the g++ rebuild path in
``native/__init__.py:get_lib`` is exercised from a clean state.
"""

import os
import subprocess
import sys
import tarfile
import io

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = ("erfnet-train", "erfnet-eval-iou", "erfnet-eval-color",
           "erfnet-eval-server", "erfnet-eval-forward-time",
           "erfnet-imagenet")


def _run(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          **kw)


@pytest.mark.slow
def test_clean_checkout_install_cli_and_native_rebuild(tmp_path):
    # 1. clean checkout: committed files only (no _loader.so, no caches)
    co = tmp_path / "checkout"
    co.mkdir()
    tar_bytes = subprocess.run(["git", "-C", REPO, "archive", "HEAD"],
                               capture_output=True, timeout=120,
                               check=True).stdout
    with tarfile.open(fileobj=io.BytesIO(tar_bytes)) as tf:
        tf.extractall(co)
    so = co / "erfnet_pytorch_tpu" / "native" / "_loader.so"
    assert not so.exists(), "clean checkout must not ship a prebuilt .so"

    # 2. fresh venv over the baked-in packages.  The image's "system"
    # python is itself a venv (/opt/venv), so --system-site-packages
    # would link past it to the bare base interpreter; seed a .pth
    # instead so the fresh venv sees the baked-in jax/setuptools (no
    # network in this environment).
    venv = tmp_path / "venv"
    r = _run([sys.executable, "-m", "venv", str(venv)])
    assert r.returncode == 0, r.stderr
    vpy = str(venv / "bin" / "python")
    import sysconfig
    base_site = sysconfig.get_paths()["purelib"]
    vsite = (venv / "lib" / f"python{sys.version_info.major}."
             f"{sys.version_info.minor}" / "site-packages")
    (vsite / "_base_env.pth").write_text(base_site + "\n")
    # force the CPU backend the way this image requires: the axon TPU
    # plugin prepends itself to jax_platforms and IGNORES the
    # JAX_PLATFORMS env var (CLAUDE.md), so a backend init inside any
    # subprocess below could open a session on the fragile TPU tunnel.
    # sitecustomize runs at interpreter start, before any script code.
    (vsite / "sitecustomize.py").write_text(
        "try:\n"
        "    import jax\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "except Exception:\n"
        "    pass\n")
    r = _run([vpy, "-m", "pip", "install", "-e", str(co),
              "--no-build-isolation", "--no-deps", "--quiet"])
    assert r.returncode == 0, f"pip install -e failed:\n{r.stderr}"

    # 3. every console script parses --help (imports the package and its
    # CLI surface without touching devices)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for script in SCRIPTS:
        exe = venv / "bin" / script
        assert exe.exists(), f"console script {script} not installed"
        r = _run([str(exe), "--help"], env=env)
        assert r.returncode == 0, f"{script} --help: {r.stderr[-800:]}"
        assert "usage" in r.stdout.lower(), f"{script}: {r.stdout[:200]}"

    # 4. native loader rebuilds from loader.cc on first use.  cwd is a
    # neutral dir: python -c puts cwd on sys.path, and running from the
    # working tree would import ITS package (with its prebuilt .so)
    # instead of the editable checkout.
    code = ("import erfnet_pytorch_tpu.native as n; "
            "print(n.__file__); print('available:', n.available())")
    r = _run([vpy, "-c", code], env=env, cwd=str(tmp_path))
    assert str(co) in r.stdout.splitlines()[0], r.stdout
    assert r.returncode == 0, r.stderr
    assert "available: True" in r.stdout, (r.stdout, r.stderr)
    assert so.exists(), "get_lib() did not rebuild _loader.so from source"

    # 5. and the rebuilt library actually decodes (round-trip one PNG)
    code = (
        "import numpy as np, erfnet_pytorch_tpu.native as n\n"
        "from PIL import Image\n"
        "import tempfile, os\n"
        "p = os.path.join(tempfile.mkdtemp(), 'x.png')\n"
        "rgb = (np.arange(48*96*3) % 255).astype('uint8')"
        ".reshape(48, 96, 3)\n"
        "Image.fromarray(rgb).save(p)\n"
        "ldr = n.NativeBatchLoader(1)\n"
        "im, lab = ldr.load_batch([p], [''], 48, 96)\n"
        "assert im.shape == (1, 48, 96, 3), im.shape\n"
        "err = np.abs(im[0] - rgb.astype('float32')/255.0).max()\n"
        "assert err < 1e-6, err\n"
        "print('decode ok')\n")
    r = _run([vpy, "-c", code], env=env, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "decode ok" in r.stdout
