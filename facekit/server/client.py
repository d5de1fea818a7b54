"""Demo client, replacing the reference's `main` binary.

The reference client (``src/main.cpp:11-56``) JPEG-encodes an image, POSTs
the raw bytes to ``/recognize``, parses {"userId","similarity"}, annotates
the image, and writes ``vis.jpg``. Same flow here; also supports the
``/inference`` WebSocket path.
"""

from __future__ import annotations

import argparse
import asyncio
import json


def _read_image(image_path: str):
    import cv2
    img = cv2.imread(image_path)
    if img is None:
        raise SystemExit(f"cannot read image: {image_path}")
    return img


def recognize(host: str, port: int, image_path: str, out_path: str = None):
    import cv2
    import urllib.request

    img = _read_image(image_path)
    ok, buf = cv2.imencode(".jpg", img)
    req = urllib.request.Request(
        f"http://{host}:{port}/recognize", data=buf.tobytes(), method="POST")
    with urllib.request.urlopen(req) as resp:
        body = resp.read().decode()
    print(body)
    result = json.loads(body)
    if out_path and isinstance(result, dict):
        label = f"{result['userId']} {result['similarity']:.3f}"
        vis = img.copy()
        cv2.putText(vis, label, (8, 24), cv2.FONT_HERSHEY_DUPLEX, 0.8,
                    (0, 255, 0), 1)
        cv2.imwrite(out_path, vis)
        print(f"wrote {out_path}")
    return result


async def inference_ws(host: str, port: int, image_path: str):
    import cv2
    import aiohttp

    img = _read_image(image_path)
    ok, buf = cv2.imencode(".jpg", img)
    async with aiohttp.ClientSession() as session:
        async with session.ws_connect(f"http://{host}:{port}/inference") as ws:
            await ws.send_bytes(buf.tobytes())
            msg = await ws.receive()
            print(msg.data if len(str(msg.data)) < 300 else
                  str(msg.data)[:300] + "...")
            return msg.data


def main(argv=None):
    ap = argparse.ArgumentParser("facekit demo client")
    ap.add_argument("image")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=18080)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ws", action="store_true",
                    help="use the /inference WebSocket instead of /recognize")
    args = ap.parse_args(argv)
    if args.ws:
        asyncio.run(inference_ws(args.host, args.port, args.image))
    else:
        recognize(args.host, args.port, args.image, args.out)


if __name__ == "__main__":
    main()
