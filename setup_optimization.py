#!/usr/bin/env python
"""Optimization-suite setup & self-test — analog of
/root/reference/setup_optimization.py.

Checks the project structure and dependencies, smoke-tests each
optimization component (setup_optimization.py:250-377 contract:
test_memory_manager / test_batch_processor / test_optimization_config /
test_optimization_manager / test_performance_analyzer), and writes a
report.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from typing import Callable, Dict, List, Tuple


class OptimizationSetup:
    """setup_optimization.py:22-605 analog."""

    REQUIRED_FILES = [
        "unet_watermark_tpu/utils/memory.py",
        "unet_watermark_tpu/utils/batching.py",
        "unet_watermark_tpu/utils/optimization_config.py",
        "unet_watermark_tpu/utils/optimization_manager.py",
        "unet_watermark_tpu/utils/performance_analyzer.py",
    ]
    REQUIRED_MODULES = ["jax", "flax", "optax", "numpy", "psutil", "yaml"]

    def __init__(self, project_root: str = "."):
        self.root = project_root
        self.results: Dict[str, Dict] = {}

    # ---- structure / deps --------------------------------------------------
    def check_structure(self) -> bool:
        missing = [f for f in self.REQUIRED_FILES
                   if not os.path.exists(os.path.join(self.root, f))]
        self.results["structure"] = {"ok": not missing, "missing": missing}
        return not missing

    def check_dependencies(self) -> bool:
        missing = []
        for m in self.REQUIRED_MODULES:
            try:
                __import__(m)
            except ImportError:
                missing.append(m)
        self.results["dependencies"] = {"ok": not missing,
                                        "missing": missing}
        return not missing

    # ---- component smoke tests (:250-377) -----------------------------------
    def test_memory_manager(self) -> bool:
        from unet_watermark_tpu.utils import TPUMemoryManager

        mm = TPUMemoryManager()
        snap = mm.snapshot()
        assert snap.host_total > 0
        assert mm.check_memory_pressure() in ("ok", "warning", "critical")
        return True

    def test_batch_processor(self) -> bool:
        from unet_watermark_tpu.utils import AdaptiveBatchProcessor

        p = AdaptiveBatchProcessor(lambda xs: [x * 2 for x in xs],
                                   initial_batch_size=4)
        out = p.process_all(list(range(10)))
        assert sorted(out) == [x * 2 for x in range(10)]
        return True

    def test_optimization_config(self) -> bool:
        from unet_watermark_tpu.utils import OptimizationConfig

        for level in ("conservative", "balanced", "aggressive"):
            cfg = OptimizationConfig.from_level(level)
            assert cfg.validate() == []
        assert OptimizationConfig.auto_detect().validate() == []
        return True

    def test_optimization_manager(self) -> bool:
        from unet_watermark_tpu.utils import OptimizationManager

        om = OptimizationManager()
        with om.optimization_context("selftest"):
            time.sleep(0.01)
        assert om.get_recommendations()
        om.shutdown()
        return True

    def test_performance_analyzer(self) -> bool:
        from unet_watermark_tpu.utils import PerformanceAnalyzer

        pa = PerformanceAnalyzer()

        @pa.performance_profile("selftest_op")
        def work():
            time.sleep(0.002)

        work()
        assert pa.profiler.stats("selftest_op")["count"] == 1
        return True

    # ---- runner --------------------------------------------------------------
    def test_optimization_tools(self) -> bool:
        tests: List[Tuple[str, Callable[[], bool]]] = [
            ("memory_manager", self.test_memory_manager),
            ("batch_processor", self.test_batch_processor),
            ("optimization_config", self.test_optimization_config),
            ("optimization_manager", self.test_optimization_manager),
            ("performance_analyzer", self.test_performance_analyzer),
        ]
        all_ok = True
        for name, fn in tests:
            try:
                ok = bool(fn())
                self.results[name] = {"ok": ok}
            except Exception as e:  # noqa: BLE001
                self.results[name] = {"ok": False, "error": str(e),
                                      "trace": traceback.format_exc()}
                ok = False
            all_ok &= ok
            print(f"  {'PASS' if ok else 'FAIL'}  {name}")
        return all_ok

    def write_report(self, path: str = "optimization_setup_report.json"
                     ) -> str:
        with open(path, "w") as f:
            json.dump(self.results, f, indent=2)
        return path

    def run(self) -> bool:
        print("checking structure...")
        s = self.check_structure()
        print("checking dependencies...")
        d = self.check_dependencies()
        print("running component self-tests...")
        t = self.test_optimization_tools()
        report = self.write_report()
        print(f"report: {report}")
        return s and d and t


def main(argv=None):
    p = argparse.ArgumentParser(description="optimization setup self-test")
    p.add_argument("--project-root", default=".")
    args = p.parse_args(argv)
    ok = OptimizationSetup(args.project_root).run()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
