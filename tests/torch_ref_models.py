"""Torch oracle models for forward-parity tests.

These re-create, in plain CPU torch (torchvision is not installed in this
image), the exact networks the reference trains:

- torchvision ``resnet{34,101,152}`` encoder semantics (7x7/2 stem, BN eps
  1e-5, BasicBlock for 34 / Bottleneck-v1.5 with the stride on the 3x3 conv
  for 101/152, 1x1 downsample projections) as consumed by the reference's
  UNetResNet (/root/reference/src/unet_models.py:344-371 — note the reference
  replaces torchvision's 3x3/2 stem maxpool with a plain 2x2/2 pool at
  src/unet_models.py:360-363 and never uses ``encoder.maxpool``).
- torchvision ``vgg11``/``vgg16`` ``features`` stacks as consumed by UNet11
  (src/unet_models.py:68-97) and UNetVGG16 (src/unet_models.py:252-301).
- The TernausNet decoders: DecoderBlock (k3/s2/p1/op1 deconv,
  src/unet_models.py:42-53), DecoderBlockV2 (k4/s2/p1 deconv or
  bilinear+2xConvRelu, src/unet_models.py:125-150), and the full UNetResNet /
  AlbuNet / UNet11 / UNetVGG16 wirings (src/unet_models.py:56-106,153-221,
  224-312,315-403).

State-dict key names intentionally match what a real reference checkpoint
contains (``encoder.conv1.weight``, ``center.block.0.conv.weight``, ...), so
``mapping_tpu.models.torch_convert`` converts real checkpoints and these
oracles identically.

Dropout is omitted: the reference calls ``F.dropout2d(x, p)`` without
``training=self.training`` (src/unet_models.py:312,403), i.e. dropout stays
stochastic even in eval — parity is only defined at p=0, which is also the
production config (neptune.yaml dropout settings flow through
src/models.py). Tests compare at dropout_2d=0.
"""

import torch
from torch import nn


# ---------------------------------------------------------------- encoders
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        # torchvision "v1.5": the stride sits on the 3x3 conv.
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    """torchvision resnet{34,101,152}-compatible trunk (fc head omitted —
    the reference never touches it)."""

    CONFIGS = {
        34: (BasicBlock, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    def __init__(self, depth):
        super().__init__()
        block, layers = self.CONFIGS[depth]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        cin = 64
        for i, n in enumerate(layers):
            planes = 64 * (2 ** i)
            stride = 1 if i == 0 else 2
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                down = None
                if b == 0 and (s != 1 or cin != planes * block.expansion):
                    down = nn.Sequential(
                        nn.Conv2d(cin, planes * block.expansion, 1, stride=s, bias=False),
                        nn.BatchNorm2d(planes * block.expansion),
                    )
                blocks.append(block(cin, planes, s, down))
                cin = planes * block.expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):  # stages, for per-stage parity checks
        x = self.relu(self.bn1(self.conv1(x)))
        return x


def vgg_features(cfg):
    """torchvision ``make_layers`` equivalent: 'M' = 2x2 maxpool, int = 3x3
    conv + inplace ReLU; indices in the Sequential match torchvision."""
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(inplace=True)]
            cin = v
    return nn.Sequential(*layers)


VGG11_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")


# ---------------------------------------------------------------- decoders
class ConvRelu(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1)
        self.activation = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.activation(self.conv(x))


class DecoderBlock(nn.Module):
    """TernausNet V1 block (src/unet_models.py:42-53)."""

    def __init__(self, cin, mid, cout):
        super().__init__()
        self.block = nn.Sequential(
            ConvRelu(cin, mid),
            nn.ConvTranspose2d(mid, cout, 3, stride=2, padding=1, output_padding=1),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.block(x)


class DecoderBlockV2(nn.Module):
    """TernausNet V2 block (src/unet_models.py:125-150)."""

    def __init__(self, cin, mid, cout, is_deconv=True):
        super().__init__()
        if is_deconv:
            self.block = nn.Sequential(
                ConvRelu(cin, mid),
                nn.ConvTranspose2d(mid, cout, 4, stride=2, padding=1),
                nn.ReLU(inplace=True),
            )
        else:
            self.block = nn.Sequential(
                nn.Upsample(scale_factor=2, mode="bilinear"),
                ConvRelu(cin, mid),
                ConvRelu(mid, cout),
            )

    def forward(self, x):
        return self.block(x)


# ------------------------------------------------------------- full models
class TorchUNetResNet(nn.Module):
    """Reference UNetResNet wiring (src/unet_models.py:315-403), dropout at 0."""

    def __init__(self, encoder_depth, num_classes=2, num_filters=32, is_deconv=True):
        super().__init__()
        nf = num_filters
        self.encoder = TorchResNet(encoder_depth)
        bottom = 512 if encoder_depth == 34 else 2048
        self.pool = nn.MaxPool2d(2, 2)
        self.center = DecoderBlockV2(bottom, nf * 16, nf * 8, is_deconv)
        self.dec5 = DecoderBlockV2(bottom + nf * 8, nf * 16, nf * 8, is_deconv)
        self.dec4 = DecoderBlockV2(bottom // 2 + nf * 8, nf * 16, nf * 8, is_deconv)
        self.dec3 = DecoderBlockV2(bottom // 4 + nf * 8, nf * 8, nf * 2, is_deconv)
        self.dec2 = DecoderBlockV2(bottom // 8 + nf * 2, nf * 4, nf * 4, is_deconv)
        self.dec1 = DecoderBlockV2(nf * 4, nf * 4, nf, is_deconv)
        self.dec0 = ConvRelu(nf, nf)
        self.final = nn.Conv2d(nf, num_classes, 1)

    def stages(self, x):
        e = self.encoder
        conv1 = self.pool(e.relu(e.bn1(e.conv1(x))))  # ref conv1 incl. 2x2 pool
        conv2 = e.layer1(conv1)
        conv3 = e.layer2(conv2)
        conv4 = e.layer3(conv3)
        conv5 = e.layer4(conv4)
        return conv1, conv2, conv3, conv4, conv5

    def forward(self, x):
        conv1, conv2, conv3, conv4, conv5 = self.stages(x)
        dec = self.center(self.pool(conv5))
        dec = self.dec5(torch.cat([dec, conv5], 1))
        dec = self.dec4(torch.cat([dec, conv4], 1))
        dec = self.dec3(torch.cat([dec, conv3], 1))
        dec = self.dec2(torch.cat([dec, conv2], 1))
        dec = self.dec1(dec)
        dec = self.dec0(dec)
        return self.final(dec)


class TorchUNet11(nn.Module):
    """Reference UNet11 wiring (src/unet_models.py:56-106)."""

    def __init__(self, num_classes=2, num_filters=32):
        super().__init__()
        nf = num_filters
        self.pool = nn.MaxPool2d(2, 2)
        self.encoder = vgg_features(VGG11_CFG)
        self.relu = self.encoder[1]
        self.center = DecoderBlock(nf * 16, nf * 16, nf * 8)
        self.dec5 = DecoderBlock(nf * 24, nf * 16, nf * 8)
        self.dec4 = DecoderBlock(nf * 24, nf * 16, nf * 4)
        self.dec3 = DecoderBlock(nf * 12, nf * 8, nf * 2)
        self.dec2 = DecoderBlock(nf * 6, nf * 4, nf)
        self.dec1 = ConvRelu(nf * 3, nf)
        self.final = nn.Conv2d(nf, num_classes, 1)

    def forward(self, x):
        e, r, p = self.encoder, self.relu, self.pool
        conv1 = r(e[0](x))
        conv2 = r(e[3](p(conv1)))
        conv3 = r(e[8](r(e[6](p(conv2)))))
        conv4 = r(e[13](r(e[11](p(conv3)))))
        conv5 = r(e[18](r(e[16](p(conv4)))))
        dec = self.center(p(conv5))
        dec = self.dec5(torch.cat([dec, conv5], 1))
        dec = self.dec4(torch.cat([dec, conv4], 1))
        dec = self.dec3(torch.cat([dec, conv3], 1))
        dec = self.dec2(torch.cat([dec, conv2], 1))
        dec = self.dec1(torch.cat([dec, conv1], 1))
        return self.final(dec)


class TorchUNetVGG16(nn.Module):
    """Reference UNetVGG16 wiring (src/unet_models.py:224-312), dropout at 0."""

    def __init__(self, num_classes=2, num_filters=32, is_deconv=True):
        super().__init__()
        nf = num_filters
        self.pool = nn.MaxPool2d(2, 2)
        self.encoder = vgg_features(VGG16_CFG)
        self.relu = nn.ReLU(inplace=True)
        self.center = DecoderBlockV2(512, nf * 16, nf * 8, is_deconv)
        self.dec5 = DecoderBlockV2(512 + nf * 8, nf * 16, nf * 8, is_deconv)
        self.dec4 = DecoderBlockV2(512 + nf * 8, nf * 16, nf * 8, is_deconv)
        self.dec3 = DecoderBlockV2(256 + nf * 8, nf * 8, nf * 2, is_deconv)
        self.dec2 = DecoderBlockV2(128 + nf * 2, nf * 4, nf, is_deconv)
        self.dec1 = ConvRelu(64 + nf, nf)
        self.final = nn.Conv2d(nf, num_classes, 1)

    def forward(self, x):
        e, r, p = self.encoder, self.relu, self.pool
        conv1 = r(e[2](r(e[0](x))))
        conv2 = r(e[7](r(e[5](p(conv1)))))
        conv3 = r(e[14](r(e[12](r(e[10](p(conv2)))))))
        conv4 = r(e[21](r(e[19](r(e[17](p(conv3)))))))
        conv5 = r(e[28](r(e[26](r(e[24](p(conv4)))))))
        dec = self.center(p(conv5))
        dec = self.dec5(torch.cat([dec, conv5], 1))
        dec = self.dec4(torch.cat([dec, conv4], 1))
        dec = self.dec3(torch.cat([dec, conv3], 1))
        dec = self.dec2(torch.cat([dec, conv2], 1))
        dec = self.dec1(torch.cat([dec, conv1], 1))
        return self.final(dec)


def randomize_bn_stats(model, seed=0):
    """Give every BN layer non-trivial running stats so eval-mode parity
    actually exercises mean/var/eps handling (fresh stats are 0/1 and would
    mask a swapped mean/var or wrong eps)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.5
            m.running_var = torch.rand(m.num_features, generator=g) * 2.0 + 0.2
    return model
