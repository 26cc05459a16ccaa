"""Structural validation of the container recipe (Dockerfile + docker/).

The development environment has no docker daemon (recorded in the
Dockerfile header), so the image build itself cannot run here; this pins
everything that CAN be checked without one, so the file does not rot:
every COPY source exists, the build smoke is the synthetic CLI the test
suite already exercises end-to-end (test_run_cli.py), the entrypoint is a
real console script, and the jax pin matches docs/DEPLOY.md.  Matches the
reference's deployment deliverable (/root/reference/Dockerfile:1-130 +
build.sh + run_docker.sh)."""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dockerfile():
    with open(os.path.join(REPO, "Dockerfile")) as f:
        return f.read()


def test_copy_sources_exist():
    df = _dockerfile()
    for m in re.finditer(r"^COPY\s+(.+?)\s+\S+$", df, re.M):
        for src in m.group(1).split():
            assert os.path.exists(os.path.join(REPO, src)), (
                f"Dockerfile COPY source missing: {src}"
            )


def test_native_make_target_exists():
    assert "make -C native" in _dockerfile()
    assert os.path.exists(os.path.join(REPO, "native", "Makefile"))
    with open(os.path.join(REPO, "native", "Makefile")) as f:
        assert "liblapjv.so" in f.read()


def test_smoke_command_is_the_tested_cli():
    """The build smoke must be a command the suite runs for real elsewhere
    (test_run_cli.py drives --synthetic end-to-end)."""
    df = _dockerfile()
    assert "busca-track --synthetic" in df
    # the entry point resolves to a real module:function
    with open(os.path.join(REPO, "pyproject.toml")) as f:
        py = f.read()
    assert 'busca-track = "busca_tpu.eval.run:main"' in py
    assert 'busca-serve = "busca_tpu.serve.server:main"' in py
    assert 'ENTRYPOINT ["busca-serve"]' in df


def test_jax_pin_matches_deploy_doc():
    df = _dockerfile()
    m = re.search(r'JAX_SPEC="jax\[cpu\]==([\d.]+)"', df)
    assert m, "Dockerfile lost its default JAX pin"
    with open(os.path.join(REPO, "docs", "DEPLOY.md")) as f:
        deploy = f.read()
    assert m.group(1) in deploy, (
        f"Dockerfile pins jax {m.group(1)} but docs/DEPLOY.md pins a "
        f"different version — keep them in lockstep"
    )
    # TPU build arg documented with the same version
    assert f"jax[tpu]=={m.group(1)}" in df


def test_helper_scripts_are_valid_bash():
    for name in ("build.sh", "run_serve.sh"):
        path = os.path.join(REPO, "docker", name)
        assert os.path.exists(path), name
        assert os.access(path, os.X_OK), f"{name} not executable"
        subprocess.run(["bash", "-n", path], check=True)
        with open(path) as f:
            body = f.read()
        assert "docker" in body


def test_dockerignore_or_lean_copies():
    """The image must not swallow the repo root wholesale (tests, docs,
    bench artifacts): either COPY is file-scoped (current form) or a
    .dockerignore exists."""
    df = _dockerfile()
    assert not re.search(r"^COPY\s+\.\s", df, re.M) or os.path.exists(
        os.path.join(REPO, ".dockerignore")
    )


def test_dockerignore_excludes_host_built_native():
    """COPY preserves mtimes, so a host-built native/liblapjv.so in the
    build context would make the image's `make -C native` a no-op and bake
    in the dev machine's binary (glibc mismatch risk on the slim base).
    The .dockerignore must keep built artifacts out of the context so the
    image always compiles from source."""
    with open(os.path.join(REPO, ".dockerignore")) as f:
        ignore = f.read()
    assert "native/*.so" in ignore
    assert "native/*.o" in ignore
