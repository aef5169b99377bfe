"""Generate the committed golden parity artifacts (run from the repo root).

Trains a small TransformerNet with the float64 torch oracle (the reference
training semantics, train_cnn.py:282-359) on crops of the reference demo
images, then stylizes the downscaled landscape content image
(/root/reference/inference.py:35) with the same f64 oracle. Committed
outputs lock PSNR parity of the .pth import + jitted stylize path against
regressions without needing the (absent) pretrained reference artifacts:

- content_landscape_256.png  content image, 256x172 BGR (even/4-divisible)
- golden_transfer.pth        f64-trained oracle weights (saved f32)
- golden_stylized.png        the oracle's uint8 stylized output

Regenerate with:  python tests/goldens/make_goldens.py
"""

import os
import sys

import cv2
import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from torch_ref import TorchTransformerNet, TorchVGG16Features  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
CUTE = "/root/reference/cuteimages"
STEPS = 60
SIZE = 96
CW, SW, LR = 17.0, 25.0, 0.003


def torch_gram(f):
    b, c, h, w = f.shape
    fl = f.reshape(b, c, h * w)
    return torch.bmm(fl, fl.transpose(1, 2)) / (c * h * w)


def main():
    torch.manual_seed(0)
    np.random.seed(0)

    landscape = cv2.imread(os.path.join(CUTE, "landscape.jpg"))
    style = cv2.imread(os.path.join(CUTE, "Pierre-Auguste_Renoir_2.jpg"))
    assert landscape is not None and style is not None

    content_small = cv2.resize(landscape, (256, 172))
    cv2.imwrite(
        os.path.join(HERE, "content_landscape_256.png"), content_small
    )

    # training content: random crops of the demo images (f64 BGR [0,255] NCHW)
    rng = np.random.default_rng(0)
    crops = []
    for name in sorted(os.listdir(CUTE)):
        im = cv2.imread(os.path.join(CUTE, name))
        if im is None or im.shape[0] < SIZE or im.shape[1] < SIZE:
            continue
        for _ in range(2):
            y = int(rng.integers(0, im.shape[0] - SIZE + 1))
            x = int(rng.integers(0, im.shape[1] - SIZE + 1))
            crops.append(im[y : y + SIZE, x : x + SIZE].transpose(2, 0, 1))
    content = torch.from_numpy(np.stack(crops)).double()
    print(f"{len(crops)} content crops")

    net = TorchTransformerNet().double()
    vgg = TorchVGG16Features().double().eval()
    for p in vgg.parameters():
        p.requires_grad_(False)
    neg_mean = torch.tensor([-103.939, -116.779, -123.68]).reshape(1, 3, 1, 1).double()

    style_t = torch.from_numpy(
        cv2.resize(style, (SIZE, SIZE)).transpose(2, 0, 1)[None].astype(np.float64)
    )
    with torch.no_grad():
        target_grams = {k: torch_gram(v) for k, v in vgg(style_t + neg_mean).items()}
        content_feats = vgg(content + neg_mean)["relu2_2"]

    opt = torch.optim.Adam(net.parameters(), lr=LR, weight_decay=1e-4)
    b = 4
    for step in range(STEPS):
        idx = rng.permutation(len(crops))[:b]
        batch = content[idx]
        opt.zero_grad()
        gen = net(batch)
        feats = vgg(gen + neg_mean)
        c_loss = CW * torch.nn.functional.mse_loss(feats["relu2_2"], content_feats[idx])
        s_loss = SW * sum(
            torch.nn.functional.mse_loss(
                torch_gram(v), target_grams[k].expand(b, -1, -1)
            )
            for k, v in feats.items()
        )
        total = c_loss + s_loss
        total.backward()
        opt.step()
        if step % 10 == 0:
            print(f"step {step}: content {float(c_loss):.2f} style {float(s_loss):.2f}")

    net.eval()
    # f32 keeps the artifact at ~6.8 MB; parity tests run in f32 anyway
    torch.save({k: v.float() for k, v in net.state_dict().items()},
               os.path.join(HERE, "golden_transfer.pth"))

    with torch.no_grad():
        x = torch.from_numpy(
            content_small.transpose(2, 0, 1)[None].astype(np.float64)
        )
        # f64 net reloaded from the f32 artifact so the golden reflects the
        # exact committed weights
        net2 = TorchTransformerNet().double()
        net2.load_state_dict(
            {k: v.double() for k, v in torch.load(
                os.path.join(HERE, "golden_transfer.pth")).items()}
        )
        net2.eval()
        out = net2(x)[0].numpy()
    out_u8 = np.clip(out, 0, 255).astype(np.uint8).transpose(1, 2, 0)  # HWC BGR
    cv2.imwrite(os.path.join(HERE, "golden_stylized.png"), out_u8)
    print("goldens written to", HERE)


if __name__ == "__main__":
    main()
