"""Test-only torch mirror of the SC-Depth model family.

A minimal torch implementation with torchvision-compatible parameter naming
(conv1/bn1/layerX.Y.convJ/downsample.0/...) used as a golden oracle for the
Flax models and the weight converter. torchvision itself is not available in
this environment, so the structure is rebuilt here from the torchvision
ResNet layout that the reference depends on.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchEncoder(nn.Module):
    """torchvision-layout ResNet truncated to its 5 feature stages."""

    def __init__(self, num_layers=18, num_input_images=1):
        super().__init__()
        blocks = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3]}[num_layers]
        block = Bottleneck if num_layers >= 50 else BasicBlock
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, blocks[0])
        self.layer2 = self._make_layer(block, 128, blocks[1], 2)
        self.layer3 = self._make_layer(block, 256, blocks[2], 2)
        self.layer4 = self._make_layer(block, 512, blocks[3], 2)

    def _make_layer(self, block, planes, n, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, n):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        feats = [F.relu(self.bn1(self.conv1(x)))]
        feats.append(self.layer1(self.maxpool(feats[-1])))
        feats.append(self.layer2(feats[-1]))
        feats.append(self.layer3(feats[-1]))
        feats.append(self.layer4(feats[-1]))
        return feats


class TorchConv3x3(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(int(cin), int(cout), 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TorchConv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


class TorchDepthDecoder(nn.Module):
    """Reference-layout depth decoder: ModuleList `decoder` ordered
    [upconv_4_0, upconv_4_1, ..., upconv_0_1, dispconv_0..3]."""

    def __init__(self, num_ch_enc):
        super().__init__()
        num_ch_dec = [16, 32, 64, 128, 256]
        mods = []
        self._upconvs = {}
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
        for s in range(4):
            mods.append(TorchConv3x3(num_ch_dec[s], 1))
        self.decoder = nn.ModuleList(mods)

    def forward(self, feats):
        out = {}
        x = feats[-1]
        for k, i in enumerate(range(4, -1, -1)):
            x = self.decoder[2 * k](x)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[2 * k + 1](x)
            if i < 4:
                pass
            if i in (0, 1, 2, 3):
                out[i] = 10.0 * torch.sigmoid(self.decoder[10 + i](x)) + 0.01
        return [out[s] for s in range(4)]


class TorchDispNet(nn.Module):
    def __init__(self, num_layers=18):
        super().__init__()
        ch = [64, 64, 128, 256, 512]
        if num_layers >= 50:
            ch = [64, 256, 512, 1024, 2048]
        self.encoder = _Wrap(TorchEncoder(num_layers, 1))
        self.decoder = TorchDepthDecoder(ch)

    def forward(self, x):
        return self.decoder(self.encoder.encoder(x))


class TorchPoseDecoder(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.net = nn.ModuleList(
            [
                nn.Conv2d(cin, 256, 1),
                nn.Conv2d(256, 256, 3, 1, 1),
                nn.Conv2d(256, 256, 3, 1, 1),
                nn.Conv2d(256, 6, 1),
            ]
        )

    def forward(self, feat):
        x = F.relu(self.net[0](feat))
        x = F.relu(self.net[1](x))
        x = F.relu(self.net[2](x))
        x = self.net[3](x)
        return 0.01 * x.mean(3).mean(2).view(-1, 6)


class _Wrap(nn.Module):
    """Reproduces the reference's ResnetEncoder wrapper nesting, so parameter
    keys read ``encoder.encoder.conv1.weight`` like its checkpoints."""

    def __init__(self, enc):
        super().__init__()
        self.encoder = enc


class TorchPoseNet(nn.Module):
    def __init__(self, num_layers=18):
        super().__init__()
        cin = 2048 if num_layers >= 50 else 512
        self.encoder = _Wrap(TorchEncoder(num_layers, 2))
        self.decoder = TorchPoseDecoder(cin)

    def forward(self, img1, img2):
        feats = self.encoder.encoder(torch.cat([img1, img2], 1))
        return self.decoder(feats[-1])


def randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so eval-mode comparisons
    actually exercise the statistics conversion."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(1.0 + torch.rand(m.running_var.shape, generator=g))
