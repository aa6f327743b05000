"""Performance analysis — analog of
/root/reference/src/utils/performance_analyzer.py.

Same three pieces, re-pointed at TPU telemetry:
  * SystemMonitor — background thread sampling CPU/RAM (psutil) and HBM
    use per device (jax memory_stats) instead of pynvml (:85-244)
  * PerformanceProfiler — per-operation timing with p50/p95/p99 and a
    decorator API (:246-347,738)
  * PerformanceAnalyzer — facade: rule-based recommendations (:520-572)
    and JSON/Markdown report export (:574-720)
"""
from __future__ import annotations

import dataclasses
import functools
import json
import logging
import os
import threading
import time
from typing import Any, Callable, Dict, List, Optional

from .profiler import PerformanceMonitor

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SystemSample:
    timestamp: float
    cpu_percent: float
    ram_percent: float
    device_percent: float
    device_bytes_in_use: int


class SystemMonitor:
    """1 Hz system sampler (performance_analyzer.py:85-244 analog)."""

    def __init__(self, interval: float = 1.0, history: int = 3600):
        self.interval = interval
        self.max_history = history
        self.samples: List[SystemSample] = []
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def sample(self) -> SystemSample:
        import psutil

        in_use = limit = 0
        try:
            import jax
            for d in jax.local_devices():
                stats = d.memory_stats() or {}
                in_use += stats.get("bytes_in_use", 0)
                limit += stats.get("bytes_limit", 0)
        except Exception:  # noqa: BLE001
            pass
        s = SystemSample(
            timestamp=time.time(),
            cpu_percent=psutil.cpu_percent(interval=None),
            ram_percent=psutil.virtual_memory().percent,
            device_percent=100.0 * in_use / limit if limit else 0.0,
            device_bytes_in_use=in_use)
        self.samples.append(s)
        if len(self.samples) > self.max_history:
            self.samples = self.samples[-self.max_history // 2:]
        return s

    def start(self):
        if self._thread:
            return
        self._stop.clear()

        def loop():
            while not self._stop.wait(self.interval):
                try:
                    self.sample()
                except Exception as e:  # noqa: BLE001
                    logger.debug("monitor sample failed: %s", e)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        if not self._thread:
            return
        self._stop.set()
        self._thread.join(timeout=2)
        self._thread = None

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        cpu = [s.cpu_percent for s in self.samples]
        ram = [s.ram_percent for s in self.samples]
        dev = [s.device_percent for s in self.samples]
        return {
            "samples": len(self.samples),
            "cpu_avg": sum(cpu) / len(cpu), "cpu_max": max(cpu),
            "ram_avg": sum(ram) / len(ram), "ram_max": max(ram),
            "device_avg": sum(dev) / len(dev), "device_max": max(dev),
        }


class PerformanceProfiler(PerformanceMonitor):
    """Per-op profiler with decorator API
    (performance_analyzer.py:246-347)."""

    def profile(self, name: Optional[str] = None):
        def deco(fn: Callable):
            label = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapper(*a, **kw):
                t0 = time.perf_counter()
                try:
                    return fn(*a, **kw)
                finally:
                    self.record(label, time.perf_counter() - t0)

            return wrapper

        return deco


class PerformanceAnalyzer:
    """Facade (performance_analyzer.py:349-736)."""

    def __init__(self, monitor_interval: float = 1.0):
        self.monitor = SystemMonitor(interval=monitor_interval)
        self.profiler = PerformanceProfiler()

    def start(self):
        self.monitor.start()

    def stop(self):
        self.monitor.stop()

    def performance_profile(self, name: Optional[str] = None):
        """Decorator (performance_analyzer.py:738 analog)."""
        return self.profiler.profile(name)

    # ---- recommendations (:520-572) ---------------------------------------
    def recommendations(self) -> List[str]:
        recs: List[str] = []
        summary = self.monitor.summary()
        if not summary:
            return ["no samples collected — call start() first"]
        if summary["device_avg"] < 30:
            recs.append(
                "device HBM utilization is low — increase batch size or "
                "image size to fill the MXU")
        if summary["device_max"] > 92:
            recs.append(
                "device HBM near limit — enable MODEL.REMAT or reduce "
                "batch size")
        if summary["cpu_avg"] > 85:
            recs.append(
                "host CPU saturated — the input pipeline may be starving "
                "the TPU; raise DATA.NUM_WORKERS or pre-resize images")
        if summary["ram_avg"] > 85:
            recs.append("host RAM pressure — disable DATA.CACHE_IMAGES")
        ops = self.profiler.all_stats()
        for name, st in ops.items():
            if st and st["p95"] > 4 * st["p50"]:
                recs.append(
                    f"'{name}' has heavy tail latency (p95 {st['p95']:.3f}s "
                    f"vs p50 {st['p50']:.3f}s) — look for recompiles "
                    f"(changing shapes) or host sync points")
        if not recs:
            recs.append("no issues detected")
        return recs

    # ---- reports (:574-720) -------------------------------------------------
    def export_report(self, output_dir: str) -> Dict[str, str]:
        os.makedirs(output_dir, exist_ok=True)
        data = {
            "system": self.monitor.summary(),
            "operations": self.profiler.all_stats(),
            "recommendations": self.recommendations(),
        }
        json_path = os.path.join(output_dir, "performance_report.json")
        with open(json_path, "w") as f:
            json.dump(data, f, indent=2)
        md_path = os.path.join(output_dir, "performance_report.md")
        with open(md_path, "w") as f:
            f.write("# Performance report\n\n## System\n\n")
            for k, v in (data["system"] or {}).items():
                f.write(f"- {k}: {v:.2f}\n" if isinstance(v, float)
                        else f"- {k}: {v}\n")
            f.write("\n## Operations\n\n")
            for name, st in (data["operations"] or {}).items():
                if st:
                    f.write(f"- **{name}**: n={st['count']} "
                            f"mean={st['mean'] * 1e3:.1f}ms "
                            f"p50={st['p50'] * 1e3:.1f}ms "
                            f"p95={st['p95'] * 1e3:.1f}ms\n")
            f.write("\n## Recommendations\n\n")
            for r in data["recommendations"]:
                f.write(f"- {r}\n")
        paths = {"json": json_path, "markdown": md_path}
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            if self.monitor.samples:
                fig, ax = plt.subplots(figsize=(10, 4))
                ts = [s.timestamp - self.monitor.samples[0].timestamp
                      for s in self.monitor.samples]
                ax.plot(ts, [s.cpu_percent for s in self.monitor.samples],
                        label="cpu %")
                ax.plot(ts, [s.ram_percent for s in self.monitor.samples],
                        label="ram %")
                ax.plot(ts, [s.device_percent for s in self.monitor.samples],
                        label="hbm %")
                ax.legend()
                ax.set_xlabel("s")
                png = os.path.join(output_dir, "performance_report.png")
                fig.savefig(png, dpi=100)
                plt.close(fig)
                paths["png"] = png
        except Exception as e:  # noqa: BLE001
            logger.debug("plot export skipped: %s", e)
        return paths
