"""Resource-aware chunked repair driver — analog of
/root/reference/src/scripts/batch_repair_optimizer.py.

Splits a large repair job into chunks, watching host/device memory between
chunks and pausing + cleaning under pressure (:27-264). The reference
version had drifted (it calls a removed predictor method, :160 — noted in
SURVEY.md §2.3 #38); this one drives the real `process_folder_batch` via a
per-chunk `limit`+resume (step1 skips already-produced masks), which gives
the same incremental behavior without private APIs."""
from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


class BatchRepairOptimizer:
    def __init__(self, predictor, chunk_size: int = 32,
                 pause_seconds: float = 5.0,
                 memory_manager=None):
        from ..utils.memory import get_global_memory_manager

        self.predictor = predictor
        self.chunk_size = chunk_size
        self.pause_seconds = pause_seconds
        self.mm = memory_manager or get_global_memory_manager()

    def run(self, input_folder: str, output_folder: str,
            **repair_kwargs) -> Dict:
        files = self.predictor._get_image_files(input_folder)
        total = len(files)
        chunks = max(1, -(-total // self.chunk_size))
        logger.info("repair job: %d images in %d chunks", total, chunks)
        aggregate: Dict = {"chunks": [], "total_images": total}
        done = 0
        for ci in range(chunks):
            level = self.mm.check_memory_pressure()
            if level == "critical":
                logger.warning("memory critical before chunk %d; cleaning "
                               "and pausing %.0fs", ci, self.pause_seconds)
                self.mm.aggressive_cleanup()
                time.sleep(self.pause_seconds)
            elif level == "warning":
                self.mm.cleanup()
            stats = self.predictor.process_folder_batch(
                input_folder, output_folder, limit=self.chunk_size,
                **repair_kwargs)
            aggregate["chunks"].append({
                "chunk": ci,
                "status": stats.get("status"),
                "images": stats.get("total_images", 0),
                "time": stats.get("processing_time", 0.0),
            })
            done += stats.get("total_images", 0)
            if stats.get("total_images", 0) == 0:
                break  # nothing left unprocessed
        aggregate["processed"] = done
        return aggregate


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="chunked resource-aware repair")
    p.add_argument("--model", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--chunk-size", type=int, default=32)
    args = p.parse_args(argv)

    from ..inference import WatermarkPredictor

    predictor = WatermarkPredictor(model_path=args.model,
                                   config_path=args.config)
    opt = BatchRepairOptimizer(predictor, chunk_size=args.chunk_size)
    print(opt.run(args.input, args.output, use_ocr=False, steps=1,
                  watermark_model="pushpull"))


if __name__ == "__main__":
    main()
