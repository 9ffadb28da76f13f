from . import resnet, unet, pspnet, densefusion, losses  # noqa: F401
