"""Interactive scene viewer — capability parity with the reference's viser
web viewer (gflow/viewer.py:84-246: loads every per-frame checkpoint, lets a
browser orbit the camera, steps frames, shows fps / #Gaussians, renders
server-side and pushes JPEGs).

viser is unavailable in this environment, so this is a self-contained
stdlib HTTP server: the embedded page sends camera orbit state
(azimuth/elevation/radius around a look-at target, plus frame index) and the
server renders through the standard rasterizer and streams JPEGs. Same
surface: `python -m gflow_tpu.cli.viewer --folder <logdir> --port 8080`.
"""
from __future__ import annotations

import glob
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>gflow-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px;
       border-radius:6px; }
#img { display:block; width:100vw; height:100vh; object-fit:contain; }
button { margin:2px; }
</style></head><body>
<img id="img"/>
<div id="hud">
  <div>frame <span id="fr">0</span>/<span id="total">?</span>
       | <span id="npts">?</span> pts | <span id="fps">0</span> fps</div>
  <button onclick="step(-1)">prev</button>
  <button onclick="step(1)">next</button>
  <button onclick="playing=!playing">play/pause</button>
  <button onclick="reset()">reset view</button>
  <label><input type="checkbox" id="follow" checked> training view</label>
</div>
<script>
let az=0, el=0, radius=0, frame=0, total=1, playing=false, drag=null;
let t0=performance.now(), frames=0;
const img=document.getElementById('img');
fetch('/info').then(r=>r.json()).then(d=>{
  total=d.n_frames; document.getElementById('total').innerText=total;
  document.getElementById('npts').innerText=d.n_points; });
function reset(){az=0;el=0;radius=0;}
function step(d){frame=(frame+d+total)%total;}
document.addEventListener('mousedown',e=>{drag=[e.clientX,e.clientY];});
document.addEventListener('mouseup',()=>{drag=null;});
document.addEventListener('mousemove',e=>{
  if(drag){az+=(e.clientX-drag[0])*0.005; el+=(e.clientY-drag[1])*0.005;
    el=Math.max(-1.4,Math.min(1.4,el)); drag=[e.clientX,e.clientY];
    document.getElementById('follow').checked=false;}});
document.addEventListener('wheel',e=>{radius+=e.deltaY*0.001;});
async function loop(){
  while(true){
    if(playing){frame=(frame+1)%total;}
    const follow=document.getElementById('follow').checked?1:0;
    const url=`/render?frame=${frame}&az=${az}&el=${el}&r=${radius}&follow=${follow}&t=${Date.now()}`;
    await new Promise(res=>{const im=new Image();
      im.onload=()=>{img.src=im.src;res();}; im.onerror=res; im.src=url;});
    document.getElementById('fr').innerText=frame;
    frames++; const now=performance.now();
    if(now-t0>1000){document.getElementById('fps').innerText=
      (frames*1000/(now-t0)).toFixed(1); t0=now; frames=0;}
  }
}
loop();
</script></body></html>"""


class ViewerState:
    def __init__(self, folder: str, max_frames: int | None = None):
        import jax.numpy as jnp

        from ..pipeline.trainer import GFlowTrainer
        from ..core.io import load_image

        ckpts = sorted(glob.glob(os.path.join(folder, "ckpt", "*.npz")))
        if not ckpts:
            raise FileNotFoundError(f"no checkpoints under {folder}/ckpt")
        if max_frames:
            ckpts = ckpts[:max_frames]

        d0 = np.load(ckpts[0])
        H, W = int(d0["height"]), int(d0["width"])
        self.H, self.W = H, W
        dummy = np.zeros((H, W, 3), np.float32)
        self.frames = []
        trainer = GFlowTrainer(gt_image=dummy, num_points=1000, make_logs=False)
        self.trainer = trainer
        for cp in ckpts:
            trainer.load_checkpoint(cp)
            xyz, scale, rotate, opacity, rgb = trainer._activated()
            self.frames.append(
                dict(
                    xyz=xyz, scale=scale, rotate=rotate, opacity=opacity,
                    rgb=rgb, intr=trainer.intr,
                    extr=np.asarray(trainer.get_extr()),
                )
            )
        self.n_points = int(trainer.state.n_alive)
        self.lock = threading.Lock()

    def render(self, frame: int, az: float, el: float, radius: float,
               follow: bool):
        import jax.numpy as jnp

        from ..ops.render import render_jit, render2img

        f = self.frames[frame % len(self.frames)]
        extr = f["extr"]
        if not follow:
            # orbit the training camera around the scene centroid
            c2w = np.linalg.inv(np.concatenate([extr, [[0, 0, 0, 1]]], 0))
            xyz = np.asarray(f["xyz"][: self.n_points])
            center = xyz.mean(axis=0)
            cam_pos = c2w[:3, 3]
            offset = cam_pos - center
            r0 = np.linalg.norm(offset) * (1.0 + radius)

            def rot_y(a):
                return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                                 [-np.sin(a), 0, np.cos(a)]])

            def rot_x(a):
                return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                                 [0, np.sin(a), np.cos(a)]])

            new_pos = center + rot_y(az) @ rot_x(el) @ (
                offset / max(np.linalg.norm(offset), 1e-6)
            ) * r0
            fwd = center - new_pos
            fwd /= max(np.linalg.norm(fwd), 1e-9)
            up = np.asarray([0.0, -1.0, 0.0])
            right = np.cross(fwd, up)
            right /= max(np.linalg.norm(right), 1e-9)
            up2 = np.cross(fwd, right)
            R_c2w = np.stack([right, up2, fwd], axis=1)
            c2w_new = np.eye(4)
            c2w_new[:3, :3] = R_c2w
            c2w_new[:3, 3] = new_pos
            extr = np.linalg.inv(c2w_new)[:3]

        with self.lock:
            out = render_jit(
                f["xyz"], f["scale"], f["rotate"], f["opacity"], f["rgb"],
                f["intr"], jnp.asarray(extr, jnp.float32), 0.0,
                self.W, self.H, ("rgb",),
            )
        img = render2img(out["rgb"])
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85)
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif u.path == "/info":
                body = json.dumps(
                    {"n_frames": len(state.frames),
                     "n_points": state.n_points,
                     "width": state.W, "height": state.H}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            elif u.path == "/render":
                q = parse_qs(u.query)
                g = lambda k, d: float(q.get(k, [d])[0])
                jpeg = state.render(
                    int(g("frame", 0)), g("az", 0), g("el", 0), g("r", 0),
                    bool(int(g("follow", 1))),
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(jpeg)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(folder: str, port: int = 8080, max_frames: int = None):
    state = ViewerState(folder, max_frames)
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"[viewer] {len(state.frames)} frames, {state.n_points} points — "
          f"http://localhost:{port}")
    server.serve_forever()
