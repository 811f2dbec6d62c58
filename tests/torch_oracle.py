"""torch-CPU oracle of DeepLabV2-ResNet101 (ResNetMulti) for parity tests.

Implements the architecture documented in SURVEY.md C6/C7 in plain torch:
caffe-style ResNet-101 at output stride 8 with frozen BN and V2-style summed
ASPP heads. The state_dict key layout matches the reference checkpoints
(conv1/bn1/layerN.M.convK/bnK/downsample.{0,1}/layer{5,6}.conv2d_list.K) so
the same converter that loads the reference zoo is exercised by the tests.
"""

import torch
import torch.nn as nn

AFFINE = True


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        # caffe variant: stride lives on the first 1x1 conv
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, affine=AFFINE)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride=1, padding=dilation, dilation=dilation, bias=False
        )
        self.bn2 = nn.BatchNorm2d(planes, affine=AFFINE)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4, affine=AFFINE)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        for bn in (self.bn1, self.bn2, self.bn3):
            for p in bn.parameters():
                p.requires_grad = False

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class ClassifierModule(nn.Module):
    def __init__(self, inplanes, dilation_series, padding_series, num_classes):
        super().__init__()
        self.conv2d_list = nn.ModuleList(
            [
                nn.Conv2d(
                    inplanes, num_classes, 3, stride=1,
                    padding=p, dilation=d, bias=True,
                )
                for d, p in zip(dilation_series, padding_series)
            ]
        )
        for m in self.conv2d_list:
            m.weight.data.normal_(0, 0.01)

    def forward(self, x):
        out = self.conv2d_list[0](x)
        for m in self.conv2d_list[1:]:
            out = out + m(x)
        return out


class ResNetMulti(nn.Module):
    def __init__(self, layers=(3, 4, 23, 3), num_classes=19, multi_level=True):
        super().__init__()
        self.multi_level = multi_level
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, affine=AFFINE)
        for p in self.bn1.parameters():
            p.requires_grad = False
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1, ceil_mode=True)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=1, dilation=2)
        self.layer4 = self._make_layer(512, layers[3], stride=1, dilation=4)
        if multi_level:
            self.layer5 = ClassifierModule(1024, [6, 12, 18, 24], [6, 12, 18, 24], num_classes)
        self.layer6 = ClassifierModule(2048, [6, 12, 18, 24], [6, 12, 18, 24], num_classes)

    def _make_layer(self, planes, blocks, stride=1, dilation=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4 or dilation in (2, 4):
            dbn = nn.BatchNorm2d(planes * 4, affine=AFFINE)
            for p in dbn.parameters():
                p.requires_grad = False
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                dbn,
            )
        layers = [Bottleneck(self.inplanes, planes, stride, dilation, downsample)]
        self.inplanes = planes * 4
        layers += [
            Bottleneck(self.inplanes, planes, dilation=dilation)
            for _ in range(1, blocks)
        ]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x3 = self.layer3(x)
        aux = self.layer5(x3) if self.multi_level else None
        x4 = self.layer4(x3)
        main = self.layer6(x4)
        return aux, main


def make_oracle(layers=(3, 4, 23, 3), num_classes=19, multi_level=True, seed=0):
    torch.manual_seed(seed)
    m = ResNetMulti(layers, num_classes, multi_level)
    m.eval()  # frozen-BN reference keeps BN in eval stats mode even in training
    # give BN stats non-trivial values so folding is actually exercised
    g = torch.Generator().manual_seed(seed + 1)
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 1.5, generator=g)
            if mod.affine:
                mod.weight.data.uniform_(0.5, 1.5, generator=g)
                mod.bias.data.uniform_(-0.5, 0.5, generator=g)
    return m


def train_oracle_supervised(model, batches, base_lr=2.5e-4, max_iter=100, power=0.9,
                            momentum=0.9, wd=5e-4, lambda_seg=0.1):
    """Reference-semantics torch training loop: CE(ignore -1) on upsampled
    logits (align_corners=True), two param groups (backbone 1x, heads 10x),
    per-iter poly LR, SGD(momentum, wd). Returns per-step losses."""
    import torch.nn.functional as F

    backbone, heads = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (heads if name.startswith(("layer5", "layer6")) else backbone).append(p)
    opt = torch.optim.SGD(
        [{"params": backbone, "lr": base_lr}, {"params": heads, "lr": base_lr * 10}],
        lr=base_lr, momentum=momentum, weight_decay=wd,
    )
    losses = []
    for it, (x, y) in enumerate(batches):
        lr = base_lr * (1 - it / max_iter) ** power
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).long()
        aux, main = model(xt)
        size = yt.shape[-2:]
        main = F.interpolate(main, size=size, mode="bilinear", align_corners=True)
        loss = F.cross_entropy(main, yt, ignore_index=-1)
        if aux is not None:
            aux = F.interpolate(aux, size=size, mode="bilinear", align_corners=True)
            loss = loss + lambda_seg * F.cross_entropy(aux, yt, ignore_index=-1)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def train_oracle_uda(model, batches, base_lr=2.5e-4, max_iter=100, power=0.9,
                     momentum=0.9, wd=5e-4, lambda_seg=0.1, lambda_target=0.09,
                     ratio=0.2, threshold=0.95, num_class=19,
                     target_mode="IW_maxsquare"):
    """Reference-semantics UDA loop: source CE + lambda_target * target loss
    (mode-dispatched like the reference's --target_mode branch: maxsquare /
    IW_maxsquare / entropy / IW_entropy / hard; IW modes count the guidance
    label in the histogram, detached weights gathered by argpred)
    + lambda_target*lambda_seg * aux guidance CE; one SGD step per pair."""
    import math

    import numpy as np
    import torch.nn.functional as F

    backbone, heads = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (heads if name.startswith(("layer5", "layer6")) else backbone).append(p)
    opt = torch.optim.SGD(
        [{"params": backbone, "lr": base_lr}, {"params": heads, "lr": base_lr * 10}],
        lr=base_lr, momentum=momentum, weight_decay=wd,
    )
    losses = []
    for it, (xs, ys, xt) in enumerate(batches):
        lr = base_lr * (1 - it / max_iter) ** power
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10
        xs_t = torch.from_numpy(xs).permute(0, 3, 1, 2)
        ys_t = torch.from_numpy(ys).long()
        xt_t = torch.from_numpy(xt).permute(0, 3, 1, 2)
        size = ys_t.shape[-2:]

        aux_s, main_s = model(xs_t)
        main_s = F.interpolate(main_s, size=size, mode="bilinear", align_corners=True)
        aux_s = F.interpolate(aux_s, size=size, mode="bilinear", align_corners=True)
        loss = F.cross_entropy(main_s, ys_t, ignore_index=-1) + lambda_seg * F.cross_entropy(
            aux_s, ys_t, ignore_index=-1
        )

        aux_t, main_t = model(xt_t)
        tsize = xt_t.shape[-2:]
        main_t = F.interpolate(main_t, size=tsize, mode="bilinear", align_corners=True)
        aux_t = F.interpolate(aux_t, size=tsize, mode="bilinear", align_corners=True)
        p_main = F.softmax(main_t, dim=1)
        p_aux = F.softmax(aux_t, dim=1)
        ens = (p_main + p_aux) / 2
        maxp, arg = ens.max(dim=1)
        label = torch.where(maxp > threshold, arg, torch.full_like(arg, -1)).detach()

        n = p_main.shape[0]

        def iw_pixel_weights():
            argpred = p_main.argmax(dim=1)
            pix_w = torch.zeros_like(maxp)
            for i in range(n):
                hist = torch.histc(
                    label[i].float(), bins=num_class + 1, min=-1,
                    max=num_class - 1,
                ).float()[1:]
                w = 1.0 / torch.max(
                    hist.pow(ratio) * hist.sum().pow(1 - ratio), torch.ones(1)
                )
                pix_w[i] = w[argpred[i]]
            return pix_w.detach()

        if target_mode == "IW_maxsquare":
            pix_w = iw_pixel_weights()
            loss_t = -(p_main.pow(2) * pix_w.unsqueeze(1)).sum() / (n * num_class)
        elif target_mode == "maxsquare":
            loss_t = -p_main.pow(2).mean() / 2
        elif target_mode == "entropy":
            ent = -(p_main * torch.log(p_main + 1e-30)).sum(dim=1)
            loss_t = ent.mean() / math.log(num_class)
        elif target_mode == "IW_entropy":
            pix_w = iw_pixel_weights()
            ent = -(p_main * torch.log(p_main + 1e-30)).sum(dim=1)
            loss_t = (ent * pix_w).mean() / math.log(num_class)
        elif target_mode == "hard":
            # hard pseudo-label CE on the main head's log-probabilities
            # (guard the all-ignored readout like the aux CE below)
            if (label != -1).any():
                loss_t = F.nll_loss(
                    torch.log(p_main.clamp(min=1e-30)), label, ignore_index=-1
                )
            else:
                loss_t = torch.zeros(())
        else:
            raise ValueError(f"unknown target_mode {target_mode!r}")
        # torch CE over an all-ignored target reads NaN (with zero grads);
        # the jax framework returns 0 for that case — same gradients, so
        # guard the readout identically for trajectory comparison
        if (label != -1).any():
            loss_aux_t = F.cross_entropy(aux_t, label, ignore_index=-1)
        else:
            loss_aux_t = torch.zeros(())
        loss = loss + lambda_target * loss_t + lambda_target * lambda_seg * loss_aux_t

        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses
