"""Native host runtime: C++ sources for libghost_rt.so (SPSC frame
ring + fused u8<->f32 conversion). Shipped as package data; built on
first use by ghost_tpu.data.frames._build_lib. See ghost_rt.cpp."""
