/* Upload -> canvas bbox annotation -> SSE streaming -> results.
 * Plain-canvas rewrite of the reference's Konva-based UI flow
 * (upload, per-system boxes, EventSource token stream, postprocess). */

let tmpdir = null;
let boxes = [];          // [[x0,y0,x1,y1]] in image coordinates
let img = new Image();
let scale = 1;
let drawing = null;
let events = null;

const $ = (id) => document.getElementById(id);

async function api(path, opts = {}) {
  opts.headers = Object.assign({}, opts.headers, tmpdir ? { "X-Tmpdir": tmpdir } : {});
  const r = await fetch(path, opts);
  if (!r.ok) throw new Error(`${path}: ${r.status}`);
  return r.json();
}

$("upload-btn").onclick = async () => {
  const f = $("file-input").files[0];
  if (!f) return alert("Choose an image first");
  ({ tmpdir } = await api("/tmpdir/create", { method: "POST" }));
  const form = new FormData();
  form.append("image", f);
  await api("/upload", { method: "POST", body: form });
  img = new Image();
  img.onload = () => {
    const canvas = $("annotate-canvas");
    scale = Math.min(1, 1000 / img.width);
    canvas.width = img.width * scale;
    canvas.height = img.height * scale;
    boxes = [];
    draw();
    $("annotate-section").hidden = false;
  };
  img.src = URL.createObjectURL(f);
};

function draw() {
  const canvas = $("annotate-canvas");
  const ctx = canvas.getContext("2d");
  ctx.drawImage(img, 0, 0, canvas.width, canvas.height);
  ctx.strokeStyle = "#e33";
  ctx.lineWidth = 2;
  for (const [x0, y0, x1, y1] of boxes)
    ctx.strokeRect(x0 * scale, y0 * scale, (x1 - x0) * scale, (y1 - y0) * scale);
  if (drawing) {
    ctx.strokeStyle = "#39f";
    const [x0, y0, x1, y1] = drawing;
    ctx.strokeRect(x0 * scale, y0 * scale, (x1 - x0) * scale, (y1 - y0) * scale);
  }
}

const canvasPos = (e) => {
  const r = $("annotate-canvas").getBoundingClientRect();
  return [(e.clientX - r.left) / scale, (e.clientY - r.top) / scale];
};

$("annotate-canvas").onmousedown = (e) => {
  const [x, y] = canvasPos(e);
  drawing = [x, y, x, y];
};
$("annotate-canvas").onmousemove = (e) => {
  if (!drawing) return;
  const [x, y] = canvasPos(e);
  drawing[2] = x; drawing[3] = y;
  draw();
};
$("annotate-canvas").onmouseup = () => {
  if (!drawing) return;
  let [x0, y0, x1, y1] = drawing;
  drawing = null;
  if (Math.abs(x1 - x0) > 8 && Math.abs(y1 - y0) > 8)
    boxes.push([Math.min(x0, x1), Math.min(y0, y1), Math.max(x0, x1), Math.max(y0, y1)]);
  draw();
};
$("clear-boxes").onclick = () => { boxes = []; draw(); };

$("run-btn").onclick = async () => {
  await api("/inference/setup", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({ bboxes: boxes }),
  });
  $("stream-section").hidden = false;
  $("token-stream").textContent = "";
  $("status").textContent = "Encoding…";
  events = new EventSource(`/inference/stream?tmpdir=${encodeURIComponent(tmpdir)}`);
  events.addEventListener("encoding_start", () => $("status").textContent = "Encoding image…");
  events.addEventListener("encoding_finish", () => $("status").textContent = "Decoding…");
  events.addEventListener("step", (e) => {
    const d = JSON.parse(e.data);
    $("token-stream").textContent += d.tokens.join(" ") + " ";
    $("token-stream").scrollTop = $("token-stream").scrollHeight;
  });
  events.addEventListener("inference_finish", (e) => {
    const d = JSON.parse(e.data);
    $("token-stream").textContent += `\n--- system ${d.system + 1} done ---\n`;
  });
  events.addEventListener("all_inference_finish", async () => {
    events.close();
    $("status").textContent = "Post-processing…";
    const res = await api("/inference/postprocess", { method: "POST" });
    $("status").textContent = "Done";
    $("result-section").hidden = false;
    if (res.ok) {
      $("confidence").textContent = res.confidence != null
        ? `Confidence: ${(res.confidence * 100).toFixed(1)}%` : "";
      $("rendered").innerHTML = "";
      for (const b64 of res.rendered_images) {
        const im = document.createElement("img");
        im.src = `data:image/png;base64,${b64}`;
        $("rendered").appendChild(im);
      }
    } else {
      $("confidence").textContent = `Delinearization failed: ${res.error}`;
    }
  });
  events.onerror = () => { $("status").textContent = "Stream error"; events.close(); };
};

$("download-btn").onclick = () => {
  window.location = `/download?tmpdir=${encodeURIComponent(tmpdir)}`;
};
$("reset-btn").onclick = async () => {
  try { await api("/clear", { method: "POST" }); } catch (e) {}
  window.location.reload();
};
