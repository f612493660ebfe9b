"""Export Marigold (e2e-ft) depth / normal estimators to the TorchScript
contract TorchScriptPriorProvider consumes (VERDICT r4 #7).

The provider's contract (holoscene_tpu/stage0/priors.py:39-75):

    model(image [1,3,H,W] in [0,1]) -> depth  [1,1,H,W]   (affine-invariant)
                                    or normal [1,3,H,W] in [-1,1]

This script folds the reference's full diffusion pipeline
(marigold/marigold/marigold_pipeline.py:372-538 single_infer +
encode_rgb/decode_depth/decode_normal, marigold/run.py CLI defaults) into
ONE traced module, so a hermetic box needs neither `diffusers` nor the
reference's `marigold` package for live stage-0 priors:

    # on a box with diffusers + a marigold-e2e-ft checkpoint tree:
    python scripts/export_marigold_ts.py \
        --ckpt GonzaloMG/marigold-e2e-ft-depth --out marigold_depth.pt \
        --size 768
    python scripts/export_marigold_ts.py \
        --ckpt GonzaloMG/marigold-e2e-ft-normals --out marigold_normal.pt \
        --size 768 --normals
    # hermetic box:
    provider = TorchScriptPriorProvider(depth_checkpoint="marigold_depth.pt",
                                        normal_checkpoint="marigold_normal.pt")

What the wrapper reproduces, in pipeline order:
  1. processing-resolution resize (run.py --processing_res, bilinear) and
     [0,1] -> [-1,1] normalization (pipeline:245).
  2. VAE encode via encoder+quant_conv, mean of the moment chunks,
     x rgb_latent_scale_factor (encode_rgb, pipeline:481-498).
  3. zeros initial latent — the e2e-ft checkpoints' deterministic
     single-step regime (run.py defaults denoise_steps=1 noise="zeros";
     pyramid/gaussian noise need a seed the provider contract doesn't
     carry).
  4. the unrolled DDIM loop with the empty-text CLIP embedding FOLDED IN
     as a buffer (encode_empty_text, pipeline:199-213), taking
     pred_original_sample on the final step (pipeline:452-466).
  5. depth decode: post_quant_conv+decoder, channel mean, clip to [-1,1],
     -> [0,1] (decode_depth, pipeline:501-517 + single_infer:473-478);
     normal decode: decoder + L2 normalize (decode_normal:520-538).
  6. resize back to the input resolution (match_input_res, __call__:158).

`--mock` builds a tiny structurally-identical pipeline (no diffusers
needed) and exports it — tests/test_export_marigold_ts.py pins the
contract with it; a mock export is NOT a depth estimator.
"""

from __future__ import annotations

import argparse

import torch


def ddim_rows(scheduler, num_inference_steps: int):
    """(timestep, alpha_prod_t, alpha_prod_prev) rows, DDIM eta=0."""
    scheduler.set_timesteps(num_inference_steps)
    timesteps = [int(t) for t in scheduler.timesteps]
    acp = scheduler.alphas_cumprod
    step_ratio = len(acp) // num_inference_steps
    rows = []
    for t in timesteps:
        prev_t = t - step_ratio
        a_t = float(acp[t])
        a_prev = float(acp[prev_t]) if prev_t >= 0 else 1.0
        rows.append((t, a_t, a_prev))
    return rows


class MarigoldWrapper(torch.nn.Module):
    """Traced single-call depth/normal estimator (see module docstring)."""

    def __init__(self, unet, vae, empty_text_embed, scheduler,
                 num_inference_steps: int = 1, processing_res: int = 768,
                 normals: bool = False,
                 rgb_latent_scale_factor: float = 0.18215,
                 depth_latent_scale_factor: float = 0.18215):
        super().__init__()
        self.unet = unet
        self.vae = vae
        self.normals = normals
        self.proc_res = int(processing_res)
        self.rgb_sf = float(rgb_latent_scale_factor)
        self.out_sf = float(depth_latent_scale_factor)
        rows = ddim_rows(scheduler, num_inference_steps)
        self.register_buffer(
            "steps_t", torch.tensor([r[0] for r in rows], dtype=torch.long))
        self.register_buffer("alpha_t", torch.tensor([r[1] for r in rows]))
        self.register_buffer("alpha_prev",
                             torch.tensor([r[2] for r in rows]))
        # [1, n_tok, d] empty-prompt CLIP embedding, computed at export time
        self.register_buffer("empty_text", empty_text_embed.detach())

    def forward(self, image: torch.Tensor) -> torch.Tensor:
        # int() bakes the trace resolution in as a constant — the exported
        # module is resolution-specialized (--trace-res; module docstring)
        h_in, w_in = int(image.shape[2]), int(image.shape[3])
        # 1. processing-res resize (max edge), [-1,1] normalize
        scale = float(self.proc_res) / float(max(h_in, w_in))
        h_p = max(int(round(h_in * scale / 8)) * 8, 8)
        w_p = max(int(round(w_in * scale / 8)) * 8, 8)
        rgb = torch.nn.functional.interpolate(
            image, size=(h_p, w_p), mode="bilinear", align_corners=False)
        rgb = rgb * 2.0 - 1.0

        # 2. encode_rgb
        moments = self.vae.quant_conv(self.vae.encoder(rgb))
        mean, _logvar = torch.chunk(moments, 2, dim=1)
        rgb_latent = mean * self.rgb_sf

        # 3. deterministic zeros initial latent (e2e-ft regime)
        latent = torch.zeros_like(rgb_latent)

        # 4. unrolled DDIM loop, pred_original_sample on the last step
        text = self.empty_text.expand(rgb_latent.shape[0], -1, -1)
        n_steps = int(self.steps_t.shape[0])
        for i in range(n_steps):
            t = self.steps_t[i]
            a_t = self.alpha_t[i]
            a_prev = self.alpha_prev[i]
            unet_in = torch.cat([rgb_latent, latent], dim=1)
            eps = self.unet(unet_in, t, encoder_hidden_states=text).sample
            x0 = (latent - torch.sqrt(1.0 - a_t) * eps) / torch.sqrt(a_t)
            if i == n_steps - 1:
                latent = x0
            else:
                latent = (torch.sqrt(a_prev) * x0
                          + torch.sqrt(1.0 - a_prev) * eps)

        # 5. decode
        z = self.vae.post_quant_conv(latent / self.out_sf)
        stacked = self.vae.decoder(z)
        if self.normals:
            out = stacked / (
                torch.norm(stacked, p=2, dim=1, keepdim=True) + 1e-5)
        else:
            depth = stacked.mean(dim=1, keepdim=True)
            out = (torch.clip(depth, -1.0, 1.0) + 1.0) / 2.0

        # 6. back to input resolution
        out = torch.nn.functional.interpolate(
            out, size=(h_in, w_in), mode="bilinear", align_corners=False)
        if self.normals:
            out = out / (torch.norm(out, p=2, dim=1, keepdim=True) + 1e-5)
        return out


# ---------------------------------------------------------------------------
# mock pipeline (structural testing without diffusers)
# ---------------------------------------------------------------------------


class MockVae(torch.nn.Module):
    """Attribute-compatible with the AutoencoderKL surface the pipeline
    touches: encoder / quant_conv / post_quant_conv / decoder."""

    def __init__(self, latent_channels=4, vsf=8):
        super().__init__()
        self.encoder = torch.nn.Conv2d(3, latent_channels * 2, vsf,
                                       stride=vsf)
        self.quant_conv = torch.nn.Conv2d(latent_channels * 2,
                                          latent_channels * 2, 1)
        self.post_quant_conv = torch.nn.Conv2d(latent_channels,
                                               latent_channels, 1)
        self.decoder = torch.nn.ConvTranspose2d(latent_channels, 3, vsf,
                                                stride=vsf)


class MockUnet(torch.nn.Module):
    def __init__(self, latent_channels=4, embed_dim=16):
        super().__init__()
        self.body = torch.nn.Conv2d(latent_channels * 2, latent_channels,
                                    3, padding=1)
        self.ctx = torch.nn.Linear(embed_dim, latent_channels)

    def forward(self, x, t, encoder_hidden_states=None):
        h = self.body(x)
        h = h + self.ctx(encoder_hidden_states.mean(1))[:, :, None, None]
        h = h + 0.0 * t

        class _Out:
            def __init__(self, s):
                self.sample = s

        return _Out(h)


class MockScheduler:
    def __init__(self, n_train=1000):
        betas = torch.linspace(0.00085, 0.012, n_train)
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.timesteps = None

    def set_timesteps(self, n):
        n_train = len(self.alphas_cumprod)
        ratio = n_train // n
        self.timesteps = torch.arange(n_train - 1, -1, -ratio)[:n]


def build_mock(normals: bool, steps: int, size: int) -> MarigoldWrapper:
    torch.manual_seed(0)
    return MarigoldWrapper(
        MockUnet(), MockVae(), torch.zeros(1, 2, 16), MockScheduler(),
        num_inference_steps=steps, processing_res=size, normals=normals)


def build_real(ckpt: str, normals: bool, steps: int, size: int,
               half: bool) -> MarigoldWrapper:
    from diffusers import AutoencoderKL, DDIMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer

    dtype = torch.float16 if half else torch.float32
    unet = UNet2DConditionModel.from_pretrained(
        ckpt, subfolder="unet", torch_dtype=dtype).eval()
    vae = AutoencoderKL.from_pretrained(
        ckpt, subfolder="vae", torch_dtype=dtype).eval()
    scheduler = DDIMScheduler.from_pretrained(ckpt, subfolder="scheduler")
    tokenizer = CLIPTokenizer.from_pretrained(ckpt, subfolder="tokenizer")
    text_encoder = CLIPTextModel.from_pretrained(
        ckpt, subfolder="text_encoder", torch_dtype=dtype).eval()
    # encode_empty_text (pipeline:199-213): empty prompt, do_not_pad
    ids = tokenizer("", padding="do_not_pad",
                    max_length=tokenizer.model_max_length,
                    truncation=True, return_tensors="pt").input_ids
    with torch.no_grad():
        empty_embed = text_encoder(ids)[0].to(dtype)
    return MarigoldWrapper(unet, vae, empty_embed, scheduler,
                           num_inference_steps=steps, processing_res=size,
                           normals=normals)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="marigold-e2e-ft checkpoint tree / hub id")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=1,
                    help="DDIM steps (e2e-ft default 1)")
    ap.add_argument("--size", type=int, default=768,
                    help="processing resolution (max edge)")
    ap.add_argument("--trace-res", type=int, default=384,
                    help="H=W of the example input used for tracing")
    ap.add_argument("--normals", action="store_true")
    ap.add_argument("--half", action="store_true")
    ap.add_argument("--mock", action="store_true",
                    help="export a tiny structural mock (tests only)")
    args = ap.parse_args()

    if args.mock:
        wrapper = build_mock(args.normals, args.steps, args.size)
    else:
        assert args.ckpt, "--ckpt required without --mock"
        wrapper = build_real(args.ckpt, args.normals, args.steps, args.size,
                             args.half)

    wrapper.eval()
    ex = torch.rand(1, 3, args.trace_res, args.trace_res)
    with torch.no_grad():
        traced = torch.jit.trace(wrapper, ex)
    traced.save(args.out)
    out = traced(ex)
    kind = "normal" if args.normals else "depth"
    print(f"exported {kind} estimator -> {args.out} "
          f"(out {tuple(out.shape)}, range [{float(out.min()):.3f}, "
          f"{float(out.max()):.3f}])")


if __name__ == "__main__":
    main()
