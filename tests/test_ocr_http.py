"""PaddleOCR HTTP client against a live mock PaddleX service."""
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest
from PIL import Image


class MockPaddleHandler(BaseHTTPRequestHandler):
    response_payload = None

    def do_POST(self):
        length = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(length))
        assert "file" in body and body.get("fileType") == 1
        base64.b64decode(body["file"])  # must be valid base64
        out = json.dumps({"result": self.response_payload}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture()
def mock_server():
    server = HTTPServer(("127.0.0.1", 0), MockPaddleHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/ocr"
    server.shutdown()


@pytest.fixture()
def image_path(tmp_path):
    p = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(p)
    return p


def test_paddle_dt_polys(mock_server, image_path):
    from unet_watermark_tpu.ocr import PaddleOCRProcessor

    MockPaddleHandler.response_payload = {"ocrResults": [{
        "prunedResult": {"dt_polys": [[[1, 2], [20, 2], [20, 10], [1, 10]]]}
    }]}
    det = PaddleOCRProcessor(api_url=mock_server)
    regions = det.detect_text_regions(image_path)
    assert len(regions) == 1
    assert regions[0]["bbox"] == [1, 2, 20, 2, 20, 10, 1, 10]
    mask = det.generate_text_mask(image_path)
    assert mask[5, 10] == 255 and mask[30, 50] == 0


def test_paddle_rec_boxes_fallback(mock_server, image_path):
    from unet_watermark_tpu.ocr import PaddleOCRProcessor

    MockPaddleHandler.response_payload = {"ocrResults": [{
        "prunedResult": {"rec_boxes": [[2, 3, 15, 12]]}
    }]}
    det = PaddleOCRProcessor(api_url=mock_server)
    regions = det.detect_text_regions(image_path)
    assert len(regions) == 1
    assert len(regions[0]["bbox"]) == 8


def test_paddle_service_down(image_path):
    from unet_watermark_tpu.ocr import PaddleOCRProcessor

    det = PaddleOCRProcessor(api_url="http://127.0.0.1:1/ocr", timeout=0.5)
    assert det.detect_text_regions(image_path) == []
