// guarded wrapper so probe_scene.cpp can include the real render.hpp once
// (it has no include guard) before macro-renaming the render() call site
#pragma once
#include "/root/reference/include/render.hpp"
