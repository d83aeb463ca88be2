import os
os.environ["JAX_PLATFORMS"]="cpu"
import numpy as np, scipy.ndimage
from scipy.signal import correlate2d
import jax.numpy as jnp
from refvsr_tpu import ops
n = np.zeros((3,3)); n[1,1]=1.0
k = scipy.ndimage.gaussian_filter(n, sigma=1)
rng = np.random.default_rng(0)
x = rng.standard_normal((1,8,8,3), dtype=np.float32)
got = np.asarray(ops.gaussian_lowpass(jnp.asarray(x)))
truth = np.stack([correlate2d(np.pad(x[0,:,:,c],2,mode="reflect"), k, mode="valid") for c in range(3)], -1)
print("jax vs scipy:", np.abs(got[0]-truth).max())
import torch
conv = torch.nn.Conv2d(3,3,3,padding=0,bias=False,groups=3)
with torch.no_grad():
    conv.weight.copy_(torch.from_numpy(k).float()[None, None].repeat(3, 1, 1, 1))
ref = conv(torch.nn.ReflectionPad2d(2)(torch.from_numpy(x.transpose(0,3,1,2)))).detach().numpy()[0].transpose(1,2,0)
print("torch vs scipy:", np.abs(ref-truth).max())
# also emulate the REFERENCE weight init exactly (gaussian.py:20-27): copy into an
# already-initialized Conv2d... weights_init copies k into f.data for all params
g = torch.nn.Sequential(torch.nn.ReflectionPad2d(2), torch.nn.Conv2d(3,3,3,stride=1,padding=0,bias=None,groups=3))
for name,f in g.named_parameters():
    f.data.copy_(torch.from_numpy(k))
ref2 = g(torch.from_numpy(x.transpose(0,3,1,2))).detach().numpy()[0].transpose(1,2,0)
print("torchref2 vs scipy:", np.abs(ref2-truth).max())
