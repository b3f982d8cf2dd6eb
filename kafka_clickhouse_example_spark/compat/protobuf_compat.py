"""Make ``google.protobuf`` importable without a pip install.

Why this exists: Spark 4's ``transformWithStateInPandas`` (the arbitrary-
state streaming API used by ``streaming.pipeline.conversation_totals_tws``)
talks to the JVM state server over a protobuf wire protocol — both the
Python workers and the pre-init "driver worker" import
``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs the
``google.protobuf`` runtime. Some execution environments (including this
one) have no protobuf installed and no network to install it, but DO ship a
vendored **pure-Python** protobuf inside other tooling (notably the Google
Cloud SDK vendors one at ``lib/third_party/cloudsdk/google/protobuf``).

``ensure_protobuf()`` makes the runtime importable, preferring (in order):

1. A native, *working* ``google.protobuf`` install — used as-is. "Working"
   is verified by importing ``google.protobuf.descriptor``: merely importing
   the package is NOT sufficient evidence, because Spark worker processes
   have Spark jars on ``sys.path`` whose ``google/protobuf/*.proto``
   resource directories make ``google.protobuf`` resolve as an EMPTY
   namespace package.
2. A vendored pure-Python copy, located via ``$SPARK_GRAFT_PROTOBUF_VENDOR``
   (``path[::alias_root]`` — a ``sys.path`` entry under which
   ``<alias_root>.google.protobuf`` lives) or a small list of well-known
   locations. A meta-path finder then aliases every ``google.protobuf[.X]``
   import to the corresponding ``<alias_root>.google.protobuf[.X]`` module,
   so both names share ONE module object (no duplicated descriptor/message
   metaclasses).

PySpark's generated ``StateMessage_pb2`` was emitted by protoc 6.x, whose
preamble imports ``google.protobuf.runtime_version`` and calls
``ValidateProtobufRuntimeVersion``. Older runtimes (the cloud-sdk vendored
copy is 4.23) predate that module, so the fallback installs a no-op
``runtime_version`` shim. That intentionally bypasses protoc's gencode/
runtime version gate: the gate protects against future gencode using APIs an
old runtime lacks, and the specific surface StateMessage_pb2 needs
(``descriptor_pool.AddSerializedFile`` + ``internal.builder``, both present
since 4.x) is smoke-checked here — on failure ``ensure_protobuf`` reports
False rather than leaving a half-working runtime pretending otherwise.

Worker processes: Spark's Python workers are separate interpreters whose
``$PYTHONPATH`` the JVM *rebuilds* from sparkPythonPath +
``spark.executorEnv.PYTHONPATH`` (the driver's own env var is dropped).
``session.get_spark`` therefore sets ``spark.executorEnv.PYTHONPATH`` to
include ``contrib/pyworker_compat`` (whose ``sitecustomize.py`` re-runs
``ensure_protobuf()`` at interpreter startup — Python's ``site`` module
imports ``sitecustomize`` in every process) plus the repo root.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import os
import sys
import types

# sys.path entry -> package prefix under which google/protobuf lives.
_VENDOR_CANDIDATES: list[tuple[str, str]] = [
    ("/usr/lib/google-cloud-sdk/lib/third_party", "cloudsdk"),
]

_PB2_SURFACE = (
    "google.protobuf.descriptor",
    "google.protobuf.descriptor_pool",
    "google.protobuf.symbol_database",
    "google.protobuf.internal.builder",
)


def _protobuf_works() -> bool:
    """True iff google.protobuf resolves to a real runtime (not a namespace
    shell from jar resources) exposing the surface StateMessage_pb2 needs."""
    try:
        for mod in _PB2_SURFACE:
            importlib.import_module(mod)
        return True
    except ImportError:
        return False


class _AliasLoader(importlib.abc.Loader):
    """Loader that resolves an aliased name to an already-importable target
    module — both names end up bound to the SAME module object."""

    def __init__(self, target: str):
        self._target = target

    def create_module(self, spec):
        return importlib.import_module(self._target)

    def exec_module(self, module):  # target was fully executed by its own spec
        pass


class _ProtobufAliasFinder(importlib.abc.MetaPathFinder):
    """Redirect ``google.protobuf[.X]`` imports to ``<root>.google.protobuf[.X]``."""

    def __init__(self, alias_root: str):
        self._root = alias_root

    def find_spec(self, fullname, path=None, target=None):
        if fullname == "google.protobuf" or fullname.startswith("google.protobuf."):
            return importlib.util.spec_from_loader(
                fullname, _AliasLoader(f"{self._root}.{fullname}")
            )
        return None


def _install_runtime_version_shim(alias_root: str) -> None:
    """Give an older protobuf runtime the ``runtime_version`` module protoc
    6.x gencode imports (no-op validator — see module docstring)."""
    name = f"{alias_root}.google.protobuf.runtime_version"
    if name in sys.modules:
        return
    rv = types.ModuleType(name)

    class Domain:  # mirrors google.protobuf.runtime_version.Domain
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    rv.Domain = Domain
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    sys.modules[name] = rv
    pb = sys.modules.get(f"{alias_root}.google.protobuf")
    if pb is not None:
        pb.runtime_version = rv


def _install_vendored(path_entry: str, alias_root: str) -> bool:
    if not os.path.isdir(path_entry):
        return False
    if path_entry not in sys.path:
        sys.path.insert(0, path_entry)
    try:
        importlib.import_module(f"{alias_root}.google.protobuf")
    except ImportError:
        return False
    _install_runtime_version_shim(alias_root)
    # Drop any namespace-package shells cached by earlier probe imports so
    # the alias finder owns every google.protobuf* name from here on. The
    # top-level ``google`` module (if any — e.g. the jar-resource namespace
    # package) is left alone; explicit sys.modules entries win over it.
    for name in [n for n in sys.modules if n == "google.protobuf" or n.startswith("google.protobuf.")]:
        del sys.modules[name]
    if not any(isinstance(f, _ProtobufAliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _ProtobufAliasFinder(alias_root))
    if "google" not in sys.modules:
        try:
            importlib.import_module("google")
        except ImportError:
            g = types.ModuleType("google")
            g.__path__ = []  # pure parent shell; only .protobuf lives here
            sys.modules["google"] = g
    return _protobuf_works()


def ensure_protobuf() -> bool:
    """Return True if a working ``google.protobuf`` is importable (natively
    or via a vendored pure-Python fallback), installing the fallback if
    needed. Idempotent; safe to call from sitecustomize in every process."""
    if _protobuf_works():
        return True
    candidates = list(_VENDOR_CANDIDATES)
    env = os.environ.get("SPARK_GRAFT_PROTOBUF_VENDOR")
    if env:
        path, _, alias = env.partition("::")
        candidates.insert(0, (path, alias or "cloudsdk"))
    for path_entry, alias_root in candidates:
        if _install_vendored(path_entry, alias_root):
            return True
    return False


def pythonpath_entries() -> list[str]:
    """The entries a driver must place on worker PYTHONPATH (via
    ``spark.executorEnv.PYTHONPATH``, set in session.get_spark) so Python
    workers self-shim: the sitecustomize dir and the repo root
    (sitecustomize imports this module)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return [os.path.join(repo_root, "contrib", "pyworker_compat"), repo_root]
