from harp_tpu.render.pallas.raster_kernel import pallas_rasterize
