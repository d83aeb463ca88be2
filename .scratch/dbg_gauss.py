import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np, scipy.ndimage
from scipy.signal import correlate2d
import jax.numpy as jnp
from refvsr_tpu import ops
n = np.zeros((3,3)); n[1,1]=1.0
k = scipy.ndimage.gaussian_filter(n, sigma=1).astype(np.float32)
rng = np.random.default_rng(0)
x = rng.standard_normal((1,8,8,1), dtype=np.float32)
xp = np.pad(x[0,:,:,0], 2, mode="reflect")
truth = correlate2d(xp, k, mode="valid")
got = np.asarray(ops.gaussian_lowpass(jnp.asarray(x)))[0,:,:,0]
print("jax vs scipy maxdiff:", np.abs(got-truth).max())
import torch
conv = torch.nn.Conv2d(1,1,3,padding=0,bias=False)
with torch.no_grad(): conv.weight.copy_(torch.from_numpy(k)[None,None])
ref = conv(torch.nn.ReflectionPad2d(2)(torch.from_numpy(x.transpose(0,3,1,2)))).detach().numpy()[0,0]
print("torch vs scipy maxdiff:", np.abs(ref-truth).max())
