"""Every module in the package imports cleanly (catches syntax errors
and broken references in CLI modules that other tests don't touch)."""

import importlib
import pkgutil

import larvanet_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(larvanet_tpu.__path__, "larvanet_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # noqa: BLE001
            failures.append((mod.name, repr(exc)))
    assert not failures, failures
