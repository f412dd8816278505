"""Embedded single-page UI for the serving app.

Replaces the reference's Streamlit front-end + vendored Speck WebGL component
(``streamlit_app/stspeck/``) with a dependency-free page: a canvas 3D
molecule viewer (CPK colours, depth-shaded spheres, drag-to-rotate), the
reference's control set (samples / steps / variance sliders,
``streamlit_app/app.py:131-158``), a scored results list, and SDF download.
"""

INDEX_HTML = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>ML Conformer Generator (TPU)</title>
<style>
 :root { --bg:#10141a; --panel:#1a2029; --fg:#e8ebf0; --dim:#8a93a3;
         --accent:#4da3ff; }
 body { margin:0; font:14px/1.5 system-ui, sans-serif; background:var(--bg);
        color:var(--fg); display:grid; grid-template-columns:320px 1fr 300px;
        height:100vh; }
 .panel { background:var(--panel); padding:16px; overflow-y:auto; }
 h1 { font-size:16px; margin:0 0 12px; }
 label { display:block; margin:12px 0 4px; color:var(--dim); }
 input[type=range] { width:100%; }
 .val { float:right; color:var(--fg); }
 textarea { width:100%; height:120px; background:#0c0f14; color:var(--fg);
            border:1px solid #2a3242; border-radius:4px; font:11px monospace; }
 button { width:100%; padding:10px; margin-top:14px; background:var(--accent);
          border:0; border-radius:6px; color:#fff; font-weight:600;
          cursor:pointer; }
 button:disabled { background:#32404f; cursor:wait; }
 #viewer { display:block; width:100%; height:100%; cursor:grab; }
 .sample { padding:8px; margin:6px 0; background:#0c0f14; border-radius:6px;
           cursor:pointer; border:1px solid transparent; }
 .sample:hover, .sample.sel { border-color:var(--accent); }
 .score { color:var(--dim); font-size:12px; }
 #status { margin-top:10px; color:var(--dim); font-size:12px;
           white-space:pre-line; }
 a.dl { color:var(--accent); display:block; margin-top:10px; }
</style>
</head>
<body>
<div class="panel">
 <h1>ML Conformer Generator <span style="color:var(--dim)">TPU</span></h1>
 <label>Reference conformer (.mol, .sdf or .pdb)</label>
 <textarea id="molblock" placeholder="Paste a MOL block or choose a file"></textarea>
 <input type="file" id="molfile" accept=".mol,.sdf,.pdb">
 <label>Samples <span class="val" id="nsv">20</span></label>
 <input type="range" id="nsamples" min="10" max="40" value="20"
        oninput="nsv.textContent=this.value">
 <label>Diffusion steps <span class="val" id="dsv">100</span></label>
 <input type="range" id="dsteps" min="20" max="100" step="10" value="100"
        oninput="dsv.textContent=this.value">
 <label>Size variance <span class="val" id="vv">2</span></label>
 <input type="range" id="variance" min="0" max="5" value="2"
        oninput="vv.textContent=this.value">
 <button id="go" onclick="generate()">Generate</button>
 <div id="status"></div>
 <a class="dl" id="dl" style="display:none" download="samples.sdf">Download SDF</a>
</div>
<canvas id="viewer"></canvas>
<div class="panel"><h1>Samples</h1><div id="list"></div></div>
<script>
const CPK = {C:'#b0b8c4', N:'#4f7fff', O:'#ff5050', F:'#4fdf4f', P:'#ff9f30',
             S:'#ffd24f', Cl:'#30d030', Br:'#a05030', H:'#dddddd'};
const RAD = {C:.76, N:.71, O:.66, F:.57, P:1.07, S:1.05, Cl:1.02, Br:1.20, H:.31};
let mol = null, rotX = -0.4, rotY = 0.6, scale = 36;
const cv = document.getElementById('viewer'), ctx = cv.getContext('2d');

function parseMol(block) {
  const lines = block.split('\n');
  const na = parseInt(lines[3].slice(0,3)), nb = parseInt(lines[3].slice(3,6));
  const atoms = [], bonds = [];
  for (let i = 0; i < na; i++) {
    const l = lines[4+i];
    atoms.push({x:+l.slice(0,10), y:+l.slice(10,20), z:+l.slice(20,30),
                el:l.slice(31,34).trim()});
  }
  for (let i = 0; i < nb; i++) {
    const l = lines[4+na+i];
    bonds.push({a:+l.slice(0,3)-1, b:+l.slice(3,6)-1, o:+l.slice(6,9)});
  }
  const cx = atoms.reduce((s,a)=>s+a.x,0)/na, cy = atoms.reduce((s,a)=>s+a.y,0)/na,
        cz = atoms.reduce((s,a)=>s+a.z,0)/na;
  atoms.forEach(a => {a.x-=cx; a.y-=cy; a.z-=cz;});
  return {atoms, bonds};
}
function project(a) {
  const cX=Math.cos(rotX), sX=Math.sin(rotX), cY=Math.cos(rotY), sY=Math.sin(rotY);
  let x = a.x*cY + a.z*sY, z0 = -a.x*sY + a.z*cY;
  let y = a.y*cX - z0*sX, z = a.y*sX + z0*cX;
  return {x: cv.width/2 + x*scale, y: cv.height/2 - y*scale, z};
}
function draw() {
  cv.width = cv.clientWidth; cv.height = cv.clientHeight;
  ctx.clearRect(0,0,cv.width,cv.height);
  if (!mol) return;
  const pts = mol.atoms.map(project);
  ctx.lineWidth = 2; ctx.strokeStyle = '#5a6474';
  for (const b of mol.bonds) {
    const p = pts[b.a], q = pts[b.b];
    for (let k = 0; k < b.o; k++) {
      const off = (k - (b.o-1)/2) * 3;
      ctx.beginPath();
      ctx.moveTo(p.x+off, p.y+off); ctx.lineTo(q.x+off, q.y+off);
      ctx.stroke();
    }
  }
  const order = pts.map((p,i)=>[p.z,i]).sort((u,v)=>u[0]-v[0]);
  for (const [,i] of order) {
    const a = mol.atoms[i], p = pts[i];
    const r = (RAD[a.el]||0.8)*scale*0.45, depth = 0.75 + 0.25*Math.tanh(p.z/4);
    const g = ctx.createRadialGradient(p.x-r/3, p.y-r/3, r/6, p.x, p.y, r);
    g.addColorStop(0, '#ffffff'); g.addColorStop(0.25, CPK[a.el]||'#999');
    g.addColorStop(1, '#000000');
    ctx.globalAlpha = depth;
    ctx.beginPath(); ctx.arc(p.x, p.y, r, 0, 7); ctx.fillStyle = g; ctx.fill();
    ctx.globalAlpha = 1;
  }
}
let drag = null;
cv.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmousemove = e => {
  if (!drag) return;
  rotY += (e.clientX-drag[0])*0.01; rotX += (e.clientY-drag[1])*0.01;
  drag = [e.clientX, e.clientY]; draw();
};
window.onmouseup = () => drag = null;
cv.onwheel = e => { scale *= e.deltaY < 0 ? 1.1 : 0.9; draw(); e.preventDefault(); };
window.onresize = draw;

molfile.onchange = async () => {
  molblock.value = await molfile.files[0].text();
  mol = parseMol(molblock.value); draw();
};
molblock.onchange = () => { try { mol = parseMol(molblock.value); draw(); } catch(e){} };

function show(block) { mol = parseMol(block); draw(); }

async function generate() {
  const btn = document.getElementById('go'), st = document.getElementById('status');
  btn.disabled = true; st.textContent = 'Generating… (first request compiles)';
  try {
    const r = await fetch('/api/generate', {method:'POST',
      body: JSON.stringify({mol_block: molblock.value,
        n_samples:+nsamples.value, diffusion_steps:+dsteps.value,
        variance:+variance.value})});
    const data = await r.json();
    if (!r.ok) throw new Error(data.error || r.status);
    const m = data.metrics;
    st.textContent = `${m.valid}/${m.requested} valid · gen ${m.generation_s}s · eval ${m.evaluation_s}s`;
    const list = document.getElementById('list');
    list.innerHTML = '';
    data.samples.forEach((s, i) => {
      const d = document.createElement('div');
      d.className = 'sample';
      d.innerHTML = `#${i+1} <div class="score">shape ${(100*s.shape_tanimoto).toFixed(1)}% · chem ${(100*s.chemical_tanimoto).toFixed(1)}%</div>`
        + (s.smiles ? `<div class="score" style="word-break:break-all">${s.smiles}</div>` : '');
      d.onclick = () => { document.querySelectorAll('.sample').forEach(x=>x.classList.remove('sel'));
                          d.classList.add('sel'); show(s.mol_block); };
      list.appendChild(d);
    });
    if (data.samples.length) show(data.samples[0].mol_block);
    const dl = document.getElementById('dl');
    if (data.sdf) { dl.href = URL.createObjectURL(new Blob([data.sdf])); dl.style.display='block'; }
  } catch (e) { st.textContent = 'Error: ' + e.message; }
  btn.disabled = false;
}
</script>
</body>
</html>
"""
